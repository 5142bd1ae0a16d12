from pulpo_tpu.compat.torch_import import import_torch_state_dict, remap_legacy_keys  # noqa: F401
