"""Elliptic-curve layer: BN254 G1 group ops + MSM (replaces halo2curves +
the MSM backend of scroll-tech/halo2 in the reference stack)."""

from zkevm_tpu.ec import goldens, group
from zkevm_tpu.ec.group import G1

__all__ = ["G1", "goldens", "group"]
