"""siammask_tpu.eval"""
