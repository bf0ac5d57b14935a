"""Utilities: structural weight migration, misc helpers."""

from joshupscale_tpu.utils.migrate import copy_model_variables, lcs

__all__ = ["copy_model_variables", "lcs"]
