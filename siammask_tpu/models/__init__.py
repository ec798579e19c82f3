"""siammask_tpu.models"""
