"""Framework utilities: config/flag system, palettes, profiling, system helpers."""

from segsplat_tpu.utils.config import (ModelParams, OptimizationParams, ParamGroup,
                                       PipelineParams, get_combined_args,
                                       load_json_config, save_cfg_args)
from segsplat_tpu.utils.palette import bit_shuffle_palette, colorize_labels
from segsplat_tpu.utils.system import mkdir_p, safe_state, search_for_max_iteration

__all__ = [
    "ModelParams", "OptimizationParams", "ParamGroup", "PipelineParams",
    "get_combined_args", "load_json_config", "save_cfg_args",
    "bit_shuffle_palette", "colorize_labels",
    "mkdir_p", "safe_state", "search_for_max_iteration",
]
