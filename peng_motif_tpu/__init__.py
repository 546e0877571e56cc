"""peng_motif_tpu: TPU-native de-novo DNA motif discovery.

A from-scratch JAX/XLA/Pallas reimplementation of the capabilities of
soedinglab/PEnG-motif, designed table-first for TPU: the 4**W pattern
table is a rank-W tensor, reverse complements are layout transforms,
IUPAC aggregation is a separable mask contraction, and EM is a batched
broadcast/reduce pipeline.
"""

__version__ = "1.0.0"
