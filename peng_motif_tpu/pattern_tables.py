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
from .ops import bgprobs, counting, encoding, iupac_sum
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


class _LazyBgTensors:
    """Per-order background probability tables, computed on demand.

    Parity-critical float tables are built on host in the reference's
    exact multiply order (ops/bgprobs.py host path) so downstream float
    statistics never depend on XLA fusion choices; the device view is a
    plain upload of the host table (reference: src/base_pattern.cpp:42-49
    builds all orders eagerly).
    """

    def __init__(self, v_host, length: int, both: bool):
        self._v_host = v_host
        self._length = length
        self._both = both
        self._host: dict = {}
        self._dev: dict = {}

    def __getitem__(self, order: int) -> jax.Array:
        if order not in self._dev:
            self._dev[order] = encoding.to_tensor(
                jnp.asarray(self.host_flat(order)), self._length)
        return self._dev[order]

    def host_flat(self, order: int) -> np.ndarray:
        if order not in self._host:
            from .native import bg_prob_table_native_fn  # noqa: PLC0415

            p = bg_prob_table_native_fn(
                self._v_host[: order + 1], self._length, order, self._both)
            if p is None:
                p = bgprobs.host_bg_prob_flat(
                    self._v_host, self._length, order)
                if self._both:
                    p = bgprobs.host_aggregate_double_strand_flat(
                        p, self._length)
            self._host[order] = p
        return self._host[order]


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
        zscore_threshold=None,
    ):
        self.pattern_length = W = pattern_length
        self.strand = strand
        self.k = k
        self.max_k = max(k, max_k)
        self.n_sequences = n_sequences
        self.number_patterns = 4 ** W
        self.both = strand == Strand.BOTH_STRANDS

        v_host = [np.asarray(vk, dtype=np.float32)
                  for vk in bg_model.v[: self.max_k + 1]]
        self.bg_tensors = _LazyBgTensors(v_host, W, self.both)

        # counting (reference: src/base_pattern.cpp:331-441) is the only
        # device program — one dispatch, one result fetch (the tunneled
        # TPU backend pays tens of ms per round trip).  With a mesh,
        # sequences shard over the data axis and tables psum (parallel/);
        # a checkpointed table skips the input scan entirely.
        counts_flat = None
        if precomputed is not None:
            self.counts_np = np.asarray(precomputed[0], dtype=np.int32)
            self.ltot = int(precomputed[1])
        elif mesh is not None:
            from .parallel.sharded import count_patterns_sharded  # noqa: PLC0415

            self.counts_np, self.ltot = count_patterns_sharded(
                padded_codes, W, self.both, mesh
            )
            self.bg_tensors.host_flat(self.k)
        else:
            # packed upload + canonical-compacted download + async
            # dispatch: the host builds its bg-probability table while
            # the device scans (ops/counting.py CountJob)
            job = counting.CountJob(padded_codes, W, self.both)
            self.bg_tensors.host_flat(self.k)
            self.counts_np, self.ltot = job.finish()

        # float statistics, built host-side in the reference's exact
        # operation order (reference: src/base_pattern.cpp:56-63);
        # single float32 ops (mul/sub/div/sqrt) are correctly rounded
        # everywhere, and log goes through the native helper for the
        # reference binary's exact libm
        self.bgp_np = self.bg_tensors.host_flat(self.k)
        from .native import base_stats_native  # noqa: PLC0415

        stats = base_stats_native(self.counts_np, self.bgp_np, self.ltot)
        if stats is not None:
            self.expected_np, self.zscores_np = stats
        else:
            self.expected_np = self.bgp_np * np.float32(self.ltot)
            counts_f = self.counts_np.astype(np.float32)
            with np.errstate(divide="ignore", invalid="ignore"):
                # (size_t - float) subtracts in float32; the unqualified
                # sqrt is the global double overload, so the division runs
                # in double before rounding back to float
                # (reference: src/base_pattern.cpp:252-258)
                num = (counts_f - self.expected_np).astype(np.float64)
                self.zscores_np = (
                    num / np.sqrt(self.expected_np.astype(np.float64))
                ).astype(np.float32)
        # the z-sort (native, GIL released) overlaps with the logp table
        # build; _seed_order joins it.  With a known selection threshold
        # the prefix-pruned variant is used (~8x faster; identical on
        # the consumed prefix — see pengnative.cpp zscore_sort_prefix).
        self._order_thread = None
        self._order_result = [None]
        self._order_thr = (None if zscore_threshold is None
                           else float(zscore_threshold))
        from .native import get_lib  # noqa: PLC0415

        if get_lib() is not None:
            import threading  # noqa: PLC0415

            from .native import (  # noqa: PLC0415
                zscore_sort_indices, zscore_sort_prefix_indices)

            z = self.zscores_np
            thr = self._order_thr

            def _sort():
                self._order_result[0] = (
                    zscore_sort_indices(z) if thr is None
                    else zscore_sort_prefix_indices(z, thr))

            self._order_thread = threading.Thread(target=_sort, daemon=True)
            self._order_thread.start()
        from .native import base_log_pvalues_native  # noqa: PLC0415

        logp = base_log_pvalues_native(self.counts_np, self.expected_np)
        if logp is None:
            # numpy fallback (may deviate by an ulp where numpy's log
            # differs from libm)
            with np.errstate(divide="ignore", invalid="ignore"):
                n = self.counts_np.astype(np.float32)
                mu = self.expected_np
                frac = (1.0 - mu / (n + 1)).astype(np.float32)
                body = (n * np.log((mu / n).astype(np.float32)) + n - mu
                        - 0.5 * np.log(6.283 * n * frac * frac))
                logp = np.where((n > mu) & (n > 5), body, 0.0)
                logp = np.where(
                    self.counts_np == 0, np.inf, logp
                ).astype(np.float32)
        self._logp_np = logp

        self._counts_flat_cache = counts_flat
        # bit-exact reference fold order for IUPAC sums (native path)
        self.exact_aggregation = True
        self._agg_cache = None

    @property
    def counts_flat(self) -> jax.Array:
        if self._counts_flat_cache is None:
            self._counts_flat_cache = jnp.asarray(self.counts_np)
        return self._counts_flat_cache

    @property
    def counts_tensor(self) -> jax.Array:
        return encoding.to_tensor(self.counts_flat, self.pattern_length)

    @property
    def _agg_tensors(self):
        """Device inputs for the fallback (non-native) aggregation path:
        canonical-masked count / expected / bg tensors."""
        if self._agg_cache is None:
            W = self.pattern_length
            expected_t = encoding.to_tensor(
                jnp.asarray(self.expected_np), W)
            bg_t = self.bg_tensors[self.k]
            if self.both:
                canon = encoding.canonical_mask(W)
                counts_c = jnp.where(canon, self.counts_tensor, 0)
                float_stack = jnp.stack(
                    [jnp.where(canon, expected_t, 0.0),
                     jnp.where(canon, bg_t, 0.0)]
                )
            else:
                counts_c = self.counts_tensor
                float_stack = jnp.stack([expected_t, bg_t])
            self._agg_cache = (counts_c, float_stack)
        return self._agg_cache

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
        agg_counts, agg_floats = self._agg_tensors
        c, f = iupac_sum.aggregate_batch(
            agg_counts,
            agg_floats,
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
        return self._logp_np

    def optimization_score(
        self, score_type: OptimizationScore, pattern: int, pseudo_expected: int
    ) -> np.float32:
        """Seed score from the base tables
        (reference: src/base_pattern.cpp:180-224)."""
        if score_type == OptimizationScore.LOGPVAL:
            # the reference returns the precomputed table value
            # (src/base_pattern.cpp:202-204); _logp_np was built with the
            # binary's exact libm semantics
            return np.float32(self._logp_np[pattern])
        from .native import base_opt_score_native  # noqa: PLC0415

        native = base_opt_score_native(
            score_type.value, int(self.counts_np[pattern]),
            self.expected_np[pattern], pseudo_expected, self.n_sequences,
        )
        if native is not None:
            return native
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

        from .native import select_patterns_walk_native  # noqa: PLC0415

        native = select_patterns_walk_native(
            order, z, self.counts_np, W, zscore_threshold, count_threshold,
            single_stranded, filter_neighbors,
        )
        if native is not None:
            return [int(p) for p in native]

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
        if getattr(self, "_order_thread", None) is not None:
            self._order_thread.join()
            self._order_thread = None
            thread_thr = getattr(self, "_order_thr", None)
            usable = (thread_thr is None
                      or thread_thr == float(zscore_threshold))
            if usable and self._order_result[0] is not None:
                return self._order_result[0]
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
