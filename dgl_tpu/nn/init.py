"""Parameter initializers matching the reference's torch conventions.

The reference initializes every hand-built layer with
``nn.init.xavier_uniform_(w, gain=calculate_gain('relu'))``
(``main_dgl_citation_sage.py:39-42``) or PyG ``glorot`` (gain 1). Matching
init statistics is part of the accuracy-parity story (SURVEY §7 "matching
DGL numerics").
"""

import math

import jax.nn.initializers as jinit

__all__ = ["xavier_uniform", "relu_gain", "kaiming_uniform_fan_in"]


def relu_gain() -> float:
    return math.sqrt(2.0)


def xavier_uniform(gain: float = 1.0):
    """torch ``xavier_uniform_`` with gain == variance_scaling(gain^2, fan_avg, uniform)."""
    return jinit.variance_scaling(gain * gain, "fan_avg", "uniform")


def kaiming_uniform_fan_in(a: float = math.sqrt(5.0)):
    """torch ``kaiming_uniform_(a=sqrt(5))`` — the default Linear/RGCN weight init.

    torch: bound = sqrt(6 / ((1 + a^2) * fan_in)); equivalent to
    variance_scaling(scale=2/(1+a^2), fan_in, uniform).
    """
    return jinit.variance_scaling(2.0 / (1.0 + a * a), "fan_in", "uniform")
