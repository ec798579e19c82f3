"""Training input pipeline: pair-sampled template/search crops with augmentation
and anchor targets (host-side numpy/cv2, feeding NHWC device batches).

Semantics follow the reference `datasets/siam_mask_dataset.py`:

- ``SubDataset``: one source (coco/vid/det/ytb_vos pre-cropped 511x511 images),
  anno JSON {video: {track: {frame: bbox}}} with zero-box filtering (:98-130),
  path scheme ``{frame:06d}.{track}.x.jpg`` / ``.m.png`` (:150-157), positive-pair
  sampling within ±frame_range (:159-184), oversample/shuffle to num_use (:137-148).
- ``Augmentation``: center crop box ± shift/scale via aug_apply, affine crop_hwc
  warp, PCA-style BGR color offset, random directional blur, horizontal flip,
  grayscale (:212-312).
- ``PairDataset``: mixes sub-datasets with per-epoch shuffled picks, negative-pair
  sampling, context-scaled target boxes (toBBox :559-575), anchor targets, and
  mask targets in {-1, +1} with per-cell mask_weight = any-positive-anchor
  (:391-606).

Output layout differs from the reference 8-tuple only in array layout (NHWC images,
labels shaped for siammask_tpu.models.losses).
"""
from __future__ import annotations

import json
import logging
import math
import random
from dataclasses import dataclass
from os.path import join

import cv2
import numpy as np

from siammask_tpu.data.anchor_target import AnchorTarget
from siammask_tpu.tracker.anchors import AnchorConfig, Anchors
from siammask_tpu.utils.bbox import Center, Corner, aug_apply, center2corner

logger = logging.getLogger("siammask_tpu")

sample_random = random.Random()
sample_random.seed(123456)


class SubDataset:
    def __init__(self, cfg: dict):
        for key in ("root", "anno"):
            if key not in cfg:
                raise ValueError(f"SubDataset needs '{key}'")

        with open(cfg["anno"]) as fin:
            self.labels = self._filter_zero(json.load(fin))

        def isint(x):
            try:
                int(x)
                return True
            except (TypeError, ValueError):
                return False

        to_del = []
        for video in self.labels:
            for track in self.labels[video]:
                frames = self.labels[video][track]
                frames = sorted(map(int, filter(isint, frames.keys())))
                self.labels[video][track]["frames"] = frames
                if not frames:
                    to_del.append((video, track))
        for video, track in to_del:
            del self.labels[video][track]
        for video in [v for v in self.labels if not self.labels[v]]:
            del self.labels[video]

        self.videos = list(self.labels.keys())

        self.root = cfg.get("root", "/")
        self.start = cfg.get("start", 0)
        self.num = len(self.labels)
        self.num_use = int(cfg.get("num_use", self.num))
        self.frame_range = cfg.get("frame_range", 100)
        self.mark = cfg.get("mark", "vid")
        self.path_format = cfg.get("path_format", "{}.{}.{}.jpg")
        self.mask_format = cfg.get("mask_format", "{}.{}.m.png")
        self.has_mask = self.mark in ("coco", "ytb_vos")
        self.pick: list[int] = []
        self.shuffle()

    @staticmethod
    def _filter_zero(anno: dict) -> dict:
        out = {}
        for video, tracks in anno.items():
            new_tracks = {}
            for trk, frames in tracks.items():
                new_frames = {}
                for frm, bbox in frames.items():
                    if len(bbox) == 4:
                        w, h = bbox[2] - bbox[0], bbox[3] - bbox[1]
                    else:
                        w, h = bbox
                    if w == 0 or h == 0:
                        continue
                    new_frames[frm] = bbox
                if new_frames:
                    new_tracks[trk] = new_frames
            if new_tracks:
                out[video] = new_tracks
        return out

    def shuffle(self, rng: random.Random | None = None) -> list[int]:
        rng = rng or sample_random
        lists = list(range(self.start, self.start + self.num))
        pick: list[int] = []
        m = 0
        while m < self.num_use:
            rng.shuffle(lists)
            pick += lists
            m += self.num
        self.pick = pick[: self.num_use]
        return self.pick

    def get_image_anno(self, video, track, frame):
        frame = f"{frame:06d}"
        image_path = join(self.root, video, self.path_format.format(frame, track, "x"))
        image_anno = self.labels[video][track][frame]
        mask_path = join(self.root, video, self.mask_format.format(frame, track))
        return image_path, image_anno, mask_path

    def get_positive_pair(self, index, rng=random):
        video_name = self.videos[index]
        video = self.labels[video_name]
        track = rng.choice(list(video.keys()))
        track_info = video[track]
        frames = track_info["frames"]

        template_idx = rng.randint(0, len(frames) - 1)
        left = max(template_idx - self.frame_range, 0)
        right = min(template_idx + self.frame_range, len(frames) - 1) + 1
        search_range = frames[left:right]
        template_frame = frames[template_idx]
        search_frame = rng.choice(search_range)
        return (self.get_image_anno(video_name, track, template_frame),
                self.get_image_anno(video_name, track, search_frame))

    def get_random_target(self, index=-1, rng=random):
        if index == -1:
            index = rng.randint(0, self.num - 1)
        video_name = self.videos[index]
        video = self.labels[video_name]
        track = rng.choice(list(video.keys()))
        frame = rng.choice(video[track]["frames"])
        return self.get_image_anno(video_name, track, frame)


def crop_hwc(image, bbox, out_sz, padding=(0, 0, 0)):
    """Affine warp of the corner-box region to out_sz x out_sz (crop_hwc :200-209)."""
    bbox = [float(x) for x in bbox]
    a = (out_sz - 1) / (bbox[2] - bbox[0])
    b = (out_sz - 1) / (bbox[3] - bbox[1])
    mapping = np.array([[a, 0, -a * bbox[0]], [0, b, -b * bbox[1]]], dtype=np.float64)
    return cv2.warpAffine(image, mapping, (out_sz, out_sz),
                          borderMode=cv2.BORDER_CONSTANT, borderValue=padding)


class Augmentation:
    """Shift/scale crop + color/blur/flip/gray augmentation (:212-312)."""

    def __init__(self, cfg: dict):
        self.shift = 0
        self.scale = 0
        self.blur = 0
        self.resize = False
        self.flip = 0
        self.rgbVar = np.array(
            [[-0.55919361, 0.98062831, -0.41940627],
             [1.72091413, 0.19879334, -1.82968581],
             [4.64467907, 4.73710203, 4.88324118]], dtype=np.float32)
        self.__dict__.update(cfg)

    @staticmethod
    def random(rng=random):
        return rng.random() * 2 - 1.0

    # NB: rng/nprng default via None sentinels — a `rng=random` default
    # evaluated in the class body would bind the `random` STATICMETHOD
    # above, not the module.
    def blur_image(self, image, rng=None, nprng=np.random):
        rng = rng or random
        def rand_kernel():
            size = int(np.round(nprng.randn(1)[0])) * 2 + 1
            if size < 0 or rng.random() < 0.5:
                return None
            size = min(size, 45)
            kernel = np.zeros((size, size))
            c = int(size / 2)
            wx = rng.random()
            kernel[:, c] += 1.0 / size * wx
            kernel[c, :] += 1.0 / size * (1 - wx)
            return kernel

        kernel = rand_kernel()
        if kernel is not None:
            image = cv2.filter2D(image, -1, kernel)
        return image

    def __call__(self, image, bbox, size, gray=False, mask=None,
                 rng=None, nprng=np.random):
        rng = rng or random
        if gray:
            grayed = cv2.cvtColor(image, cv2.COLOR_BGR2GRAY)
            image = np.stack([grayed] * 3, axis=-1)

        shape = image.shape
        # (the reference uses shape[0]//2 as cx — harmless on the square 511 crops)
        crop_bbox = center2corner(Center(shape[0] // 2, shape[1] // 2,
                                         size - 1, size - 1))
        param = {}
        if self.shift:
            param["shift"] = (Augmentation.random(rng) * self.shift,
                              Augmentation.random(rng) * self.shift)
        if self.scale:
            param["scale"] = (1.0 + Augmentation.random(rng) * self.scale,
                              1.0 + Augmentation.random(rng) * self.scale)

        crop_bbox, _ = aug_apply(Corner(*crop_bbox), param, shape)

        x1, y1 = crop_bbox.x1, crop_bbox.y1
        bbox = Corner(bbox.x1 - x1, bbox.y1 - y1, bbox.x2 - x1, bbox.y2 - y1)
        if self.scale:
            sx, sy = param["scale"]
            bbox = Corner(bbox.x1 / sx, bbox.y1 / sy, bbox.x2 / sx, bbox.y2 / sy)

        image = crop_hwc(image, crop_bbox, size)
        if mask is not None:
            mask = crop_hwc(mask, crop_bbox, size)

        offset = np.dot(self.rgbVar, nprng.randn(3, 1))[::-1].reshape(3)
        image = image - offset

        if self.blur > rng.random():
            image = self.blur_image(image, rng, nprng)

        if self.resize:
            im_sz = image.shape[:2]
            ratio = max(math.pow(rng.random(), 0.5), 0.2)
            rand_sz = (int(round(ratio * im_sz[0])), int(round(ratio * im_sz[1])))
            image = cv2.resize(image, rand_sz)
            image = cv2.resize(image, tuple(im_sz))

        if self.flip and self.flip > Augmentation.random(rng):
            image = cv2.flip(image, 1)
            if mask is not None:
                mask = cv2.flip(mask, 1)
            width = image.shape[1]
            bbox = Corner(width - 1 - bbox.x2, bbox.y1, width - 1 - bbox.x1, bbox.y2)

        return image, bbox, mask


@dataclass
class Sample:
    """One training example (NHWC images; labels shaped for models/losses.py)."""
    template: np.ndarray      # (127, 127, 3) f32
    search: np.ndarray        # (S_in, S_in, 3) f32
    cls: np.ndarray           # (k, S, S) int64 in {-1, 0, 1}
    delta: np.ndarray         # (4, k, S, S) f32
    delta_weight: np.ndarray  # (k, S, S) f32
    bbox: np.ndarray          # (4,) f32 gt corner box in search crop
    mask: np.ndarray          # (S_in, S_in) f32 in {-1, +1}
    mask_weight: np.ndarray   # (S, S) f32


class PairDataset:
    """Multi-source pair dataset (reference ``DataSets`` :391-606)."""

    def __init__(self, cfg: dict, anchor_cfg: AnchorConfig | dict, num_epoch: int = 1,
                 seed: int | None = None):
        if isinstance(anchor_cfg, dict):
            anchor_cfg = AnchorConfig.from_dict(anchor_cfg)
        self.anchors = Anchors(anchor_cfg)
        # Deterministic per-ITEM seeding (reference parity note: torch's
        # DataLoader derives deterministic worker seeds from a generator, so
        # a seeded reference run replays exactly — train_siammask.py relies
        # on that for debugging). Unseeded, the loader draws through the
        # module-global `random`/`np.random` streams (reference behavior),
        # which diverge with thread/process interleaving; with `seed` set,
        # __getitem__ hands _get_item PRIVATE per-(seed, generation, item)
        # generators, so the augmentation stream for item i is a pure
        # function of (seed, i) — independent of worker count, mode, or
        # scheduling (stronger than torch, whose stream moves when
        # num_workers changes), with no lock and no global-state mutation
        # (a concurrent unseeded loader in the same process is unaffected).
        # random.Random(k)/np.random.RandomState(k) draw the exact streams
        # random.seed(k)/np.random.seed(k) would, so seeded runs recorded
        # under the earlier re-seed-the-globals implementation replay
        # identically (experiments/overfit_tennis round-5 artifacts).
        self.seed = seed
        self._generation = 0  # bumped by shuffle() so epochs draw fresh streams
        # with a seed, pick shuffling uses a PRIVATE stream so the instance is
        # self-deterministic (the module-global sample_random is shared by
        # every dataset in the process, so its consumption order leaks between
        # instances); unseeded behavior is unchanged
        self._shuffle_rng = random.Random(seed) if seed is not None else None

        self.template_size = cfg.get("template_size", 127)
        self.origin_size = cfg.get("origin_size", 127)
        self.search_size = cfg.get("search_size", 255)
        self.base_size = cfg.get("base_size", 0)
        self.size = cfg.get("size", 17)
        self.crop_size = cfg.get("crop_size", 0)
        self.template_small = cfg.get("template_small", False)

        expected = (self.search_size - self.template_size) / self.anchors.stride \
            + 1 + self.base_size
        if expected != self.size:
            raise ValueError(f"size mismatch: computed {expected}, config {self.size}")

        self.anchors.generate_all_anchors(im_c=self.search_size // 2, size=self.size)
        self.anchor_target = AnchorTarget(cfg.get("anchor_target"))

        self.all_data = []
        start = 0
        self.num = 0
        for name, ds_cfg in cfg["datasets"].items():
            ds_cfg = dict(ds_cfg)
            ds_cfg["mark"] = name
            ds_cfg["start"] = start
            sub = SubDataset(ds_cfg)
            self.all_data.append(sub)
            start += sub.num
            self.num += sub.num_use

        aug_cfg = cfg["augmentation"]
        self.template_aug = Augmentation(aug_cfg.get("template", {}))
        self.search_aug = Augmentation(aug_cfg.get("search", {}))
        self.gray = aug_cfg.get("gray", 0)
        self.neg = aug_cfg.get("neg", 0)
        self.inner_neg = aug_cfg.get("inner_neg", 0)

        if "num" in cfg:
            self.num = int(cfg["num"])
        self.num *= num_epoch
        self.pick: list[int] = []
        self.shuffle()

    def shuffle(self):
        self._generation += 1
        rng = self._shuffle_rng or sample_random
        pick: list[int] = []
        while len(pick) < self.num:
            p = []
            for subset in self.all_data:
                p += subset.shuffle(self._shuffle_rng)
            rng.shuffle(p)
            pick += p
        self.pick = pick

    def __len__(self):
        return self.num

    def _find_dataset(self, index):
        for dataset in self.all_data:
            if dataset.start + dataset.num > index:
                return dataset, index - dataset.start
        raise IndexError(index)

    def _imread(self, path):
        img = cv2.imread(path)
        if self.origin_size == self.template_size:
            return img, 1.0
        nsize = int(round((self.template_size + 1) / (self.origin_size + 1)
                          * (img.shape[1] + 1) - 1))
        img = cv2.resize(img, (nsize, nsize))
        return img, nsize / img.shape[1]

    def _to_bbox(self, image, shape):
        """Context-scaled gt box centered in the crop (toBBox :559-575)."""
        imh, imw = image.shape[:2]
        if len(shape) == 4:
            w, h = shape[2] - shape[0], shape[3] - shape[1]
        else:
            w, h = shape
        wc_z = w + 0.5 * (w + h)
        hc_z = h + 0.5 * (w + h)
        scale_z = self.template_size / np.sqrt(wc_z * hc_z)
        return center2corner(Center(imw // 2, imh // 2, w * scale_z, h * scale_z))

    def __getitem__(self, index) -> Sample:
        if self.seed is None:
            return self._get_item(index)
        item = self.seed * 1000003 + self._generation * 7368787 + index
        rng = random.Random(item % (2 ** 31))
        nprng = np.random.RandomState((item * 920419823 + 3) % (2 ** 31))
        return self._get_item(index, rng, nprng)

    def _get_item(self, index, rng=random, nprng=np.random) -> Sample:
        index = self.pick[index]
        dataset, index = self._find_dataset(index)

        gray = self.gray and self.gray > rng.random()
        neg = self.neg and self.neg > rng.random()

        if neg:
            template = dataset.get_random_target(index, rng)
            if self.inner_neg and self.inner_neg > rng.random():
                search = dataset.get_random_target(rng=rng)
            else:
                search = rng.choice(self.all_data).get_random_target(rng=rng)
        else:
            template, search = dataset.get_positive_pair(index, rng)

        def center_crop(img, size):
            shape = img.shape[1]
            if shape == size:
                return img
            c = shape // 2
            return img[c - size // 2: c + size // 2 + 1,
                       c - size // 2: c + size // 2 + 1]

        template_image, _ = self._imread(template[0])
        if self.template_small:
            template_image = center_crop(template_image, self.template_size)
        search_image, _ = self._imread(search[0])

        if dataset.has_mask and not neg:
            search_mask = (cv2.imread(search[2], 0) > 0).astype(np.float32)
        else:
            search_mask = np.zeros(search_image.shape[:2], dtype=np.float32)

        if self.crop_size > 0:
            search_image = center_crop(search_image, self.crop_size)
            search_mask = center_crop(search_mask, self.crop_size)

        template_box = self._to_bbox(template_image, template[1])
        search_box = self._to_bbox(search_image, search[1])

        template_im, _, _ = self.template_aug(template_image, template_box,
                                              self.template_size, gray=gray,
                                              rng=rng, nprng=nprng)
        search_im, bbox, mask = self.search_aug(search_image, search_box,
                                                self.search_size, gray=gray,
                                                mask=search_mask,
                                                rng=rng, nprng=nprng)

        cls, delta, delta_weight = self.anchor_target(
            self.anchors, bbox, self.size, neg,
            rng=None if nprng is np.random else nprng)
        if dataset.has_mask and not neg:
            mask_weight = cls.max(axis=0).astype(np.float32)
        else:
            mask_weight = np.zeros((cls.shape[1], cls.shape[2]), dtype=np.float32)

        mask = ((mask > 0.5) * 2 - 1).astype(np.float32)

        return Sample(
            template=np.ascontiguousarray(template_im, dtype=np.float32),
            search=np.ascontiguousarray(search_im, dtype=np.float32),
            cls=cls, delta=delta, delta_weight=delta_weight,
            bbox=np.array(bbox, np.float32), mask=mask, mask_weight=mask_weight)


def collate(samples: list[Sample]) -> dict[str, np.ndarray]:
    """Stack samples into a batch dict of arrays (NHWC images)."""
    return {
        "template": np.stack([s.template for s in samples]),
        "search": np.stack([s.search for s in samples]),
        "label_cls": np.stack([s.cls for s in samples]),
        "label_loc": np.stack([s.delta for s in samples]),
        "label_loc_weight": np.stack([s.delta_weight for s in samples]),
        "bbox": np.stack([s.bbox for s in samples]),
        "label_mask": np.stack([s.mask for s in samples]),
        "label_mask_weight": np.stack([s.mask_weight for s in samples]),
    }


def prefetch_to_device(batches, size: int = 2, mesh=None):
    """Overlap host->device transfer with device compute — the TPU analogue of
    the reference's ``DataLoader(pin_memory=True)`` (tools/train_siammask.py:
    88-91). A background thread stages up to ``size`` batches onto the device
    (sharded over ``mesh`` when given) while the training step runs; the
    consumer receives device-resident arrays, so the step never waits on H2D.

    Exceptions in the source iterator or transfer are re-raised at the
    consumer's next pull (not swallowed in the thread). If the consumer
    abandons the generator early (break / exception / GC), the worker is
    signalled to stop instead of blocking forever on a full queue with
    ``size`` staged device batches pinned."""
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=max(1, size))
    _END = object()
    stop = threading.Event()

    def stage(batch):
        if mesh is not None:
            from siammask_tpu.parallel.mesh import shard_batch
            return shard_batch(mesh, batch)
        import jax
        import jax.numpy as jnp
        return jax.tree.map(jnp.asarray, batch)

    def put(item) -> bool:
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for b in batches:
                if not put(stage(b)):
                    return
            put(_END)
        except BaseException as e:  # noqa: BLE001 - re-raised at consumer
            put(e)

    threading.Thread(target=worker, daemon=True).start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()


# Fork-inherited registry of live process-mode loaders' datasets, keyed per
# loader so two loaders iterated concurrently (train + val) each fork workers
# against THEIR dataset (round-2 ADVICE: a single global took whichever was
# set last). Entries are published before the pool forks and removed when
# iteration ends; fork inheritance means no per-task pickling.
_WORKER_DATASETS: dict = {}
_WORKER_DATASET = None  # set per worker process by _init_worker


def _seed_worker():
    """Per-process RNG divergence for forked loader workers (torch DataLoader
    worker-seed semantics): without this every fork replays the parent's
    `random`/`np.random` state and produces identical augmentation streams."""
    import os
    seed = (os.getpid() * 1000003 + 123456) % (2 ** 31)
    random.seed(seed)
    np.random.seed(seed)


def _init_worker(key):
    global _WORKER_DATASET
    _WORKER_DATASET = _WORKER_DATASETS[key]
    _seed_worker()


def _worker_get_item(i):
    return _WORKER_DATASET[i]


class DataLoader:
    """Prefetching loader: a pool of item workers over cv2-bound __getitem__
    work feeding a SEPARATE batch-assembly executor that keeps ``prefetch``
    collated batches in flight.

    Two executors, not one: batch-level tasks block on item-level futures, so
    sharing a pool lets batch tasks starve the item tasks they wait on (with
    num_workers=1 the single worker deadlocks — round-1 ADVICE.md finding).

    ``workers_mode`` picks the item pool. "thread" (default) relies on cv2
    releasing the GIL in imread/warpAffine — zero spawn overhead, right for
    this 1-core dev host. "process" forks worker processes like the
    reference's torch DataLoader(num_workers=16..20, train_siammask.py:88-91)
    — the production choice on many-core TPU-VM hosts where the pure-Python
    augmentation/anchor-target math (GIL-bound) dominates per-item cost.
    Process workers are re-seeded per pid (torch worker-seed semantics), so
    forked children don't replay identical augmentation streams."""

    def __init__(self, dataset: PairDataset, batch_size: int, num_workers: int = 8,
                 drop_last: bool = True, prefetch: int = 3,
                 workers_mode: str = "thread"):
        assert workers_mode in ("thread", "process"), workers_mode
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.prefetch = max(1, prefetch)
        self.workers_mode = workers_mode
        n = len(dataset)
        self.num_batches = n // batch_size if drop_last else -(-n // batch_size)

    def __len__(self):
        return self.num_batches

    def _indices(self, b):
        return range(b * self.batch_size,
                     min((b + 1) * self.batch_size, len(self.dataset)))

    def __iter__(self):
        if self.num_workers <= 0:  # synchronous (reference num_workers=0 mode)
            for b in range(self.num_batches):
                yield collate([self.dataset[i] for i in self._indices(b)])
            return
        from collections import deque
        from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor

        worker_key = None
        if self.workers_mode == "process":
            # fork-inherit the dataset (publish it in the per-loader registry
            # BEFORE the pool forks) so items aren't re-pickling the dataset
            # per task; each child re-seeds its RNG streams from its pid and
            # binds its loader's dataset in the initializer
            worker_key = id(self)
            _WORKER_DATASETS[worker_key] = self.dataset
            import multiprocessing
            items = ProcessPoolExecutor(
                max_workers=self.num_workers,
                mp_context=multiprocessing.get_context("fork"),
                initializer=_init_worker, initargs=(worker_key,))
            get_item = _worker_get_item
        else:
            items = ThreadPoolExecutor(max_workers=self.num_workers)
            get_item = self.dataset.__getitem__

        try:
            with items, ThreadPoolExecutor(max_workers=self.prefetch) as batches:

                def load_batch(b):
                    return collate(list(items.map(get_item, self._indices(b))))

                pending = deque()
                for b in range(self.num_batches):
                    pending.append(batches.submit(load_batch, b))
                    if len(pending) > self.prefetch:
                        yield pending.popleft().result()
                while pending:
                    yield pending.popleft().result()
        finally:
            if worker_key is not None:
                _WORKER_DATASETS.pop(worker_key, None)
