from pulpo_tpu.eval import flow_viz  # noqa: F401
