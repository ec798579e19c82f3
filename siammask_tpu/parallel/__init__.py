"""siammask_tpu.parallel"""
