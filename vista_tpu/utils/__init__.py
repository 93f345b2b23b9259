from vista_tpu.utils.basic import append_dims, expand_dims_like  # noqa: F401
