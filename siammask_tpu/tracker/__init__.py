"""siammask_tpu.tracker"""
