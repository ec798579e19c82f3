"""siammask_tpu.data"""
