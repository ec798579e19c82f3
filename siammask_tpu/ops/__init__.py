"""siammask_tpu.ops"""
