"""Pallas TPU kernels for the multislice hot loop (SURVEY.md C6-C8, M6)."""

from .slice_step import pallas_slice_step, pallas_transmit, propagator_multiply

__all__ = ["pallas_slice_step", "pallas_transmit", "propagator_multiply"]
