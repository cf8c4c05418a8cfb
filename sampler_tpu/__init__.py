"""sampler_tpu — a TPU-native factor-graph Gibbs inference/learning engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the DeepDive /
DimmWitted sampler (HazyResearch/sampler): binary factor-graph IO, blocked
chromatic Gibbs sampling for marginal inference, and SGD weight learning —
designed for TPU meshes (independent chains over chips, data-parallel
learning with ICI all-reduce) rather than NUMA threads.
"""
from .graph import FactorGraph
from .compile import compile_graph, to_device, DeviceGraph, CompileInfo
from . import format_spec, fixtures, oracle, factor_functions

__version__ = "0.1.0"

__all__ = [
    "FactorGraph", "compile_graph", "to_device", "DeviceGraph", "CompileInfo",
    "format_spec", "fixtures", "oracle", "factor_functions",
]
