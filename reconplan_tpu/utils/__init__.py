"""Utilities: native library bindings, profiling helpers."""

from reconplan_tpu.utils.native import GraphCore, get_graphcore

__all__ = ["GraphCore", "get_graphcore"]
