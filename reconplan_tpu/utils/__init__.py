"""Utilities: native library bindings, profiling helpers."""

from reconplan_tpu.utils.native import GraphCore, get_graphcore
from reconplan_tpu.utils.profiling import StageTimer, maybe_trace, trace

__all__ = ["GraphCore", "get_graphcore", "StageTimer", "maybe_trace", "trace"]
