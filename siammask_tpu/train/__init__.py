"""siammask_tpu.train"""
