from pycusdr_tpu.config.loader import load_modular_json, strip_json_comments, merge_configs

__all__ = ["load_modular_json", "strip_json_comments", "merge_configs"]
