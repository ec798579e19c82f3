"""siammask_tpu.utils"""
