from keds_tpu.parallel.mesh import make_mesh, device_count  # noqa: F401
