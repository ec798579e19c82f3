#!/usr/bin/env bash
# Download benchmark data into data/ (reference data/get_test_data.sh).
# Requires network access; layout expected by siammask_tpu.eval.datasets:
#   data/VOT2016/<video>/{*.jpg,groundtruth.txt,*.tag} + list.txt
#   data/VOT2018/... , data/VOT2019/...
#   data/VOT2016.json etc (or build with siammask_tpu.data.gen_json.create_vot_json)
#   data/DAVIS/{JPEGImages,Annotations,ImageSets}
#   data/ytb_vos/valid/{JPEGImages,Annotations,meta.json}
set -e
cd "$(dirname "$0")/../data"

# VOT via trackdat (http://data.votchallenge.net); DAVIS from davischallenge.org
echo "Fetch VOT2016/VOT2018/VOT2019 sequence packs and unpack under data/<name>/"
echo "Fetch DAVIS-2017 trainval-480p and unpack under data/DAVIS/"
echo "Then build VOT metadata jsons:"
echo "  python -c 'from siammask_tpu.data.gen_json import create_vot_json; \\"
echo "             create_vot_json(\"data/VOT2018\", \"VOT2018\", \"data/VOT2018.json\")'"
