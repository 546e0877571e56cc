"""Phase-1 pattern tables: counts, background probabilities, statistics.

The TPU equivalent of the reference's BasePattern
(reference: src/base_pattern.{h,cpp}): one object owning the 4**W tables,
built device-side, with host mirrors for the (small) sequential decisions
(seed selection, hill-climb control flow).
"""

from __future__ import annotations

from dataclasses import dataclass
from enum import Enum
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .alphabets import base_id_to_string
from .models.background import BackgroundModel
from .ops import bgprobs, counting, encoding, iupac_sum, stats
from .utils import numerics


class Strand(Enum):
    PLUS_STRAND = 0
    BOTH_STRANDS = 1


class OptimizationScore(Enum):
    LOGPVAL = 0
    ENRICHMENT = 1
    MUTUAL_INFO = 2


@dataclass
class SeedSelection:
    patterns: List[int]


class PatternTables:
    """4**W count table + background probabilities + per-pattern stats.

    Mirrors the phase-1 construction order of the reference BasePattern
    ctor (src/base_pattern.cpp:17-64): background tables for orders
    0..max_k, double-strand aggregation, counting, expected counts,
    log p-values, z-scores.
    """

    def __init__(
        self,
        pattern_length: int,
        strand: Strand,
        k: int,
        max_k: int,
        padded_codes: np.ndarray,
        bg_model: BackgroundModel,
        n_sequences: int,
        mesh=None,
        precomputed=None,
    ):
        self.pattern_length = W = pattern_length
        self.strand = strand
        self.k = k
        self.max_k = max(k, max_k)
        self.n_sequences = n_sequences
        self.number_patterns = 4 ** W
        self.both = strand == Strand.BOTH_STRANDS

        v_dev = [jnp.asarray(vk) for vk in bg_model.v[: self.max_k + 1]]

        # background probability tensors per order (strand-aggregated in
        # BOTH_STRANDS mode, reference: src/base_pattern.cpp:42-49)
        self.bg_tensors: List[jax.Array] = []
        for order in range(self.max_k + 1):
            t = bgprobs.bg_prob_table(v_dev[: order + 1], W, order)
            if self.both:
                t = bgprobs.aggregate_double_strand(t)
            self.bg_tensors.append(t)

        # counting (reference: src/base_pattern.cpp:331-441); with a mesh,
        # sequences shard over the data axis and tables psum (parallel/);
        # a checkpointed table skips the input scan entirely
        if precomputed is not None:
            counts_flat = jnp.asarray(
                np.asarray(precomputed[0], dtype=np.int32))
            ltot = int(precomputed[1])
        elif mesh is not None:
            from .parallel.sharded import count_patterns_sharded  # noqa: PLC0415

            counts_flat, ltot = count_patterns_sharded(
                padded_codes, W, self.both, mesh
            )
        else:
            counts_flat, ltot = counting.count_patterns(
                jnp.asarray(padded_codes), W, self.both
            )
        self.counts_flat = counts_flat
        self.ltot = int(ltot)
        self.counts_tensor = encoding.to_tensor(counts_flat, W)

        # stats (reference: src/base_pattern.cpp:56-63)
        bg_k_flat = encoding.to_flat(self.bg_tensors[self.k])
        self.expected_flat = stats.expected_counts(
            bg_k_flat, jnp.asarray(float(self.ltot), dtype=jnp.float32)
        )
        self.zscores_flat = stats.zscores(counts_flat, self.expected_flat)
        self.logp_flat = stats.log_pvalues(counts_flat, self.expected_flat)

        # aggregation inputs: canonical-masked tables (see ops/iupac_sum.py)
        if self.both:
            canon = encoding.canonical_mask(W)
            counts_c = jnp.where(canon, self.counts_tensor, 0)
            float_stack = jnp.stack(
                [
                    jnp.where(canon, encoding.to_tensor(self.expected_flat, W), 0.0),
                    jnp.where(canon, self.bg_tensors[self.k], 0.0),
                ]
            )
        else:
            counts_c = self.counts_tensor
            float_stack = jnp.stack(
                [encoding.to_tensor(self.expected_flat, W), self.bg_tensors[self.k]]
            )
        self._agg_counts = counts_c
        self._agg_floats = float_stack

        # host mirrors for sequential decision logic
        self.counts_np = np.asarray(counts_flat)
        self.expected_np = np.asarray(self.expected_flat)
        self.zscores_np = np.asarray(self.zscores_flat)
        self.bgp_np = np.asarray(bg_k_flat)
        self._logp_np: Optional[np.ndarray] = None
        # bit-exact reference fold order for IUPAC sums (native path)
        self.exact_aggregation = True

    # -- aggregation -------------------------------------------------------

    def aggregate_digits(self, digit_batch: np.ndarray):
        """Batched IUPAC aggregation from digit vectors [B, W]: returns
        (counts [B] int64, expected [B] f32, bg_p [B] f32).

        Strict-parity path: native fold in the reference's summation
        order (bit-exact, see native/pengnative.cpp).  Fallback / fast
        path: separable device contractions (ops/iupac_sum.py), exact for
        counts, last-ulp different for the float sums.
        """
        digit_batch = np.asarray(digit_batch, dtype=np.int32)
        if self.exact_aggregation:
            from .native import iupac_aggregate_exact  # noqa: PLC0415

            result = iupac_aggregate_exact(
                digit_batch, self.both, self.counts_np,
                self.expected_np, self.bgp_np,
            )
            if result is not None:
                return result
        masks = iupac_sum.IUPAC_MASKS[digit_batch]
        c, f = iupac_sum.aggregate_batch(
            self._agg_counts,
            self._agg_floats,
            jnp.asarray(masks, dtype=jnp.int32),
            self.both,
        )
        c = np.asarray(c, dtype=np.int64)
        f = np.asarray(f)
        return c, f[:, 0], f[:, 1]

    def aggregate_and_score(
        self, digit_batch: np.ndarray, score_type, pseudo_expected: int
    ):
        """Single native pass: aggregation + statistics + optimization
        score for a candidate batch (bit-exact reference semantics; see
        pengnative.cpp).  Returns (counts, expected, bgp, zscore, logp,
        score) arrays or None when the native library is unavailable."""
        from .native import iupac_aggregate_score  # noqa: PLC0415

        return iupac_aggregate_score(
            np.asarray(digit_batch, dtype=np.int32), self.both,
            self.counts_np, self.expected_np, self.bgp_np,
            score_type.value, pseudo_expected, self.n_sequences,
        )

    # -- per-pattern host-side accessors ----------------------------------

    @property
    def logp_np(self) -> np.ndarray:
        if self._logp_np is None:
            self._logp_np = np.asarray(self.logp_flat)
        return self._logp_np

    def optimization_score(
        self, score_type: OptimizationScore, pattern: int, pseudo_expected: int
    ) -> np.float32:
        """Seed score from the base tables
        (reference: src/base_pattern.cpp:210-224)."""
        if score_type == OptimizationScore.LOGPVAL:
            # host recomputation with C++ promotion points (the device
            # table uses float32 logs; fine for display, not for
            # tie-sensitive decisions)
            return numerics.base_log_pvalue(
                int(self.counts_np[pattern]), self.expected_np[pattern]
            )
        if score_type == OptimizationScore.ENRICHMENT:
            return numerics.exp_count_fraction(
                int(self.counts_np[pattern]), self.expected_np[pattern],
                pseudo_expected,
            )
        return numerics.mutual_information_score(
            int(self.counts_np[pattern]), self.expected_np[pattern],
            self.n_sequences,
        )

    def to_string(self, pattern: int) -> str:
        return base_id_to_string(pattern, self.pattern_length)

    # -- seed selection (reference: src/base_pattern.cpp:443-515) ---------

    def select_base_patterns(
        self,
        zscore_threshold: float,
        count_threshold: int,
        single_stranded: bool,
        filter_neighbors: bool,
    ) -> List[int]:
        """Greedy threshold walk over z-sorted patterns with optional
        Hamming-1 neighbor suppression and revcomp dedup.  Sequential by
        construction; runs on the (small) above-threshold subset."""
        W = self.pattern_length
        z = self.zscores_np
        order = self._seed_order(zscore_threshold)

        seen = np.zeros(self.number_patterns, dtype=bool)
        selected: List[int] = []
        counts = self.counts_np
        z_thr = np.float32(zscore_threshold)
        for pattern in order:
            pattern = int(pattern)
            if z[pattern] < z_thr:
                break
            if counts[pattern] < count_threshold:
                continue
            if single_stranded:
                ok = not seen[pattern]
            else:
                rc = _revcomp_id(pattern, W)
                ok = (not seen[pattern]) and (not seen[rc])
            if not ok:
                continue
            selected.append(pattern)
            seen[pattern] = True
            if filter_neighbors:
                for p in range(W):
                    c = (pattern // (4 ** p)) % 4
                    masked = pattern - c * (4 ** p)
                    for letter in range(4):
                        seen[masked + letter * (4 ** p)] = True
        return selected


    def _seed_order(self, zscore_threshold: float) -> np.ndarray:
        """Patterns in descending-z order, ready for the threshold walk.

        Strict-parity path: full std::sort via the native helper, so
        bitwise z-score ties (every reverse-complement pair) land in the
        same order as the reference binary's libstdc++ sort
        (reference: src/base_pattern.cpp:454-458).  Fallback without a
        toolchain: sort only the above-threshold subset with
        ascending-id tie-break (documented deviation: may flip seed
        orientation within a revcomp pair).
        """
        from .native import zscore_sort_indices  # noqa: PLC0415

        z = self.zscores_np
        order = zscore_sort_indices(z)
        if order is not None:
            return order
        above = np.flatnonzero(z >= np.float32(zscore_threshold))
        return above[np.argsort(-z[above], kind="stable")]


def _revcomp_id(pattern: int, length: int) -> int:
    out = 0
    for p in range(length):
        c = (pattern // (4 ** p)) % 4
        out += (3 - c) * (4 ** (length - 1 - p))
    return out
