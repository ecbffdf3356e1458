"""Observability: per-worker stats ring buffers, post-pass analytics
(PDF plots + npz export), optional telegraf/InfluxDB metrics."""

from pycusdr_tpu.obs.visualizer import VisualizerData  # noqa: F401
