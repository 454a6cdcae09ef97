from .parser import YAMLConfig, default_config, load_config, merge_dicts  # noqa: F401
