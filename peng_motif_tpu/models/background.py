"""Order-K homogeneous Markov background model with interpolated smoothing.

Mirrors reference: src/shared/BackgroundModel.{h,cpp}.  Counting and the
conditional-probability recursion are vectorized numpy on host (the model
is tiny: 4**(K+1) floats); the distributed path feeds per-shard count
vectors through a psum instead (see parallel/sharded.py).

BaMM (k+1)-mer ids are big-endian: the earliest letter carries factor
4**k (reference: src/shared/Sequence.cpp:21-33).

N-handling quirk, reproduced exactly: the reference marks windows
containing an undefined base by adding -4**10 per N into the rolling kmer
id (src/shared/Sequence.cpp:28-33) and later skips negative
``kmer % 4**(k+1)`` values (src/shared/BackgroundModel.cpp:73-81).  In C++
the remainder keeps the dividend's sign, so a window containing an N is
skipped *unless* the base-4 value contributed by its defined letters at
factors <= 4**k is exactly 0 — in which case it is counted as (k+1)-mer 0
(all-A).  An N counts toward nothing at factors, so e.g. at order 0 every
N is tallied as 'A'.  We reproduce: count value v when (no N within the
last min(i,8)+1 positions) or v == 0.
"""

from __future__ import annotations

import os
import re
from typing import List, Optional, Sequence

import numpy as np


class BackgroundModel:
    """Interpolated Markov background model (reference: BackgroundModel.cpp)."""

    def __init__(
        self,
        sequences: Optional[Sequence[np.ndarray]] = None,
        order: int = 2,
        alpha: Optional[Sequence[float]] = None,
        interpolate: bool = True,
        name: str = "",
        counts: Optional[List[np.ndarray]] = None,
        lazy: bool = False,
    ):
        """Build from encoded sequences (BaMM codes, 0 = N) or raw counts.

        Args:
          sequences: iterable of uint8 code arrays.
          order: Markov order K.
          alpha: per-order pseudocount weights; defaults to all 1.0
            (reference: src/Global.cpp:49).
          interpolate: smooth toward lower-order conditionals
            (reference: BackgroundModel.cpp:510-516).
          counts: pre-computed count vectors (e.g. psum'd across shards);
            overrides ``sequences``.
          lazy: count in a background thread; first access to ``n``/``v``
            joins it.  Lets the (k+1)-mer scan over the corpus overlap
            the device count dispatch (the reference's serial analogue:
            BackgroundModel.cpp:59-84 runs before Peng::process).
        """
        self.order = order
        self.alpha = np.asarray(
            alpha if alpha is not None else np.ones(order + 1), dtype=np.float32
        )
        if self.alpha.shape[0] < order + 1:
            raise ValueError("alpha must have order+1 entries")
        self.interpolate = interpolate
        self.name = name

        self._count_thread = None
        if counts is not None:
            self._n = [np.asarray(c, dtype=np.int64) for c in counts]
            self._v = self._calculate_v()
        elif sequences is not None:
            if lazy:
                import threading  # noqa: PLC0415

                self._n = self._v = None

                def _run():
                    self._n = count_kmers(sequences, order)
                    self._v = self._calculate_v()

                self._count_thread = threading.Thread(target=_run, daemon=True)
                self._count_thread.start()
            else:
                self._n = count_kmers(sequences, order)
                self._v = self._calculate_v()
        else:
            raise ValueError("either sequences or counts required")

    def _join(self):
        if self._count_thread is not None:
            self._count_thread.join()
            self._count_thread = None

    @property
    def n(self) -> Optional[List[np.ndarray]]:
        self._join()
        return self._n

    @property
    def v(self) -> List[np.ndarray]:
        self._join()
        return self._v

    # -- counting & conditionals ------------------------------------------

    def _calculate_v(self) -> List[np.ndarray]:
        """Interpolated conditional probabilities
        (reference: BackgroundModel.cpp:490-530), float32 throughout with
        the reference's in-group summation order."""
        K = self.order
        n = self._n
        A = self.alpha
        v: List[np.ndarray] = []

        base_counts = np.float32(n[0].sum())
        v0 = (n[0].astype(np.float32) + A[0] * np.float32(0.25)) / (
            base_counts + A[0]
        )
        v.append(v0.astype(np.float32))

        for k in range(1, K + 1):
            nk = n[k].astype(np.float32)
            y = np.arange(4 ** (k + 1))
            y2 = y % (4 ** k)           # drop earliest letter
            yk = y // 4                 # drop latest letter
            if self.interpolate:
                vk = (nk + A[k] * v[k - 1][y2]) / (
                    n[k - 1].astype(np.float32)[yk] + A[k]
                )
            else:
                vk = (nk + A[k] * np.float32(0.25)) / (
                    n[k - 1].astype(np.float32)[yk] + A[k]
                )
            vk = vk.astype(np.float32)
            # per-context normalization over groups of 4 consecutive ids,
            # in the reference's sequential accumulation order
            g = vk.reshape(-1, 4)
            s = ((g[:, 0] + g[:, 1]) + g[:, 2]) + g[:, 3]
            vk = (g / s[:, None]).reshape(-1).astype(np.float32)
            v.append(vk)
        return v

    # -- likelihoods (reference: BackgroundModel.cpp:214-274) -------------

    def log_likelihood(self, sequences: Sequence[np.ndarray]) -> float:
        """Total log likelihood of the sequences: position i contributes
        log v[min(i,K)][(k+1)-mer ending at i], with the same N-window rule
        as counting (reference: BackgroundModel.cpp:214-270)."""
        logv = [np.log(vk.astype(np.float32)).astype(np.float32) for vk in self.v]
        total = 0.0
        for seq in sequences:
            seq = np.asarray(seq, dtype=np.int64)
            L = seq.shape[0]
            if L == 0:
                continue
            is_n = seq == 0
            csum = np.concatenate([[0], np.cumsum(is_n)])
            idx = np.arange(L)
            any_n9 = (csum[idx + 1] - csum[np.maximum(idx - 8, 0)]) > 0
            for i in range(L):
                k = min(i, self.order)
                v = 0
                for j in range(k + 1):
                    c = seq[i - j]
                    if c > 0:
                        v += (int(c) - 1) * (4 ** j)
                if (not any_n9[i]) or v == 0:
                    total += float(logv[k][v])
        return float(total)

    # -- BaMM file format -------------------------------------------------

    def write(self, directory: str) -> str:
        """Write conditional probabilities in BaMM format
        (reference: BackgroundModel.cpp:406-430).  Returns the file path."""
        suffix = ".hbcp" if self.interpolate else ".hnbcp"
        path = os.path.join(directory, (self.name or "bg") + suffix)
        with open(path, "w") as f:
            f.write(f"# K = {self.order}\n")
            f.write("# A =" + "".join(f" {a:g}" for a in self.alpha[: self.order + 1]) + "\n")
            for k in range(self.order + 1):
                f.write(" ".join(f"{x:.6e}" for x in self.v[k]) + "\n")
        return path

    @classmethod
    def read(cls, path: str) -> "BackgroundModel":
        """Read a BaMM .hbcp/.hnbcp file (reference: BackgroundModel.cpp:94-164)."""
        with open(path) as f:
            header_k = f.readline()
            m = re.match(r"#\s*K\s*=\s*(\d+)", header_k)
            if not m:
                raise ValueError(f"Wrong BaMM format: {path}")
            K = int(m.group(1))
            header_a = f.readline()
            alphas = [float(x) for x in header_a.split("=")[1].split()]
            v = []
            for k in range(K + 1):
                row = np.array([np.float32(x) for x in f.readline().split()],
                               dtype=np.float32)
                if row.shape[0] != 4 ** (k + 1):
                    raise ValueError(f"Wrong BaMM format: {path}")
                v.append(row)
        model = cls.__new__(cls)
        model.order = K
        model.alpha = np.asarray(alphas, dtype=np.float32)
        model.interpolate = path.endswith(".hbcp")
        model.name = os.path.basename(path).rsplit(".", 1)[0]
        model._count_thread = None
        model._n = None
        model._v = v
        return model


def count_kmers(sequences: Sequence[np.ndarray], order: int) -> List[np.ndarray]:
    """(k+1)-mer count vectors for k = 0..order with reference N-semantics
    (see module docstring; reference: BackgroundModel.cpp:59-84).
    Vectorized over a padded batch; ``_count_kmers_loop`` is the
    per-sequence semantics oracle."""
    sequences = list(sequences)
    if not sequences:
        return [np.zeros(4 ** (k + 1), dtype=np.int64)
                for k in range(order + 1)]
    from ..native import bg_count_kmers_native  # noqa: PLC0415

    native = bg_count_kmers_native(sequences, order)
    if native is not None:
        return native
    lengths = np.array([len(s) for s in sequences], dtype=np.int64)
    N, L = len(sequences), int(lengths.max())
    if L == 0:
        return [np.zeros(4 ** (k + 1), dtype=np.int64)
                for k in range(order + 1)]
    codes = np.zeros((N, L), dtype=np.int64)
    for i, s in enumerate(sequences):
        codes[i, : len(s)] = s

    # any_n9[b, i]: an N among in-sequence positions max(0, i-8)..i;
    # padding zeros never enter (positions >= length are masked out)
    is_n = codes == 0
    csum = np.concatenate(
        [np.zeros((N, 1), np.int64), np.cumsum(is_n, axis=1)], axis=1)
    idx = np.arange(L)
    lo = np.maximum(idx - 8, 0)
    any_n9 = (csum[:, idx + 1] - csum[:, lo]) > 0
    in_seq = idx[None, :] < lengths[:, None]

    counts = []
    v = np.zeros((N, L), dtype=np.int64)
    for k in range(order + 1):
        if k == 0:
            v = np.where(codes > 0, codes - 1, 0)
        elif k < L:
            shifted = np.zeros_like(codes)
            shifted[:, k:] = codes[:, :-k]
            v = v + np.where(shifted > 0, (shifted - 1) * (4 ** k), 0)
        ok = (idx[None, :] >= k) & in_seq & ((~any_n9) | (v == 0))
        counts.append(
            np.bincount(v[ok], minlength=4 ** (k + 1)).astype(np.int64))
    return counts


def _count_kmers_loop(
    sequences: Sequence[np.ndarray], order: int
) -> List[np.ndarray]:
    """Reference-transcription oracle for :func:`count_kmers`."""
    counts = [np.zeros(4 ** (k + 1), dtype=np.int64) for k in range(order + 1)]
    for seq in sequences:
        seq = np.asarray(seq, dtype=np.int64)
        L = seq.shape[0]
        if L == 0:
            continue
        is_n = seq == 0
        # n9[i]: any N among positions max(0, i-8)..i
        csum = np.concatenate([[0], np.cumsum(is_n)])
        idx = np.arange(L)
        lo = np.maximum(idx - 8, 0)
        any_n9 = (csum[idx + 1] - csum[lo]) > 0
        for k in range(order + 1):
            if L <= k:
                continue
            i = np.arange(k, L)
            v = np.zeros(L - k, dtype=np.int64)
            for j in range(k + 1):
                c = seq[i - j]
                v += np.where(c > 0, (c - 1) * (4 ** j), 0)
            ok = (~any_n9[i]) | (v == 0)
            np.add.at(counts[k], v[ok], 1)
    return counts


