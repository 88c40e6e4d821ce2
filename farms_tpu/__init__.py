"""FARMS-TPU: aperture-robust multi-scale event-camera optical flow, TPU-native.

A from-scratch JAX/XLA/Pallas framework with the capabilities of the
reference FARMS_Flow C++ implementation (Akolkar, Ieng & Benosman,
IEEE TPAMI 2020, doi:10.1109/TPAMI.2020.3010468).
"""
from farms_tpu.config import FlowConfig
from farms_tpu.events.io import (
    EventBatch,
    FlowOutput,
    load_events_txt,
    read_flow_txt,
    write_flow_txt,
)
from farms_tpu.pipeline.engine import FlowEngine

__all__ = [
    "FlowConfig",
    "EventBatch",
    "FlowOutput",
    "FlowEngine",
    "load_events_txt",
    "read_flow_txt",
    "write_flow_txt",
]
__version__ = "0.1.0"
