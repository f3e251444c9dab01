"""Lexical indexes: BM25 (Okapi) and TF-IDF, device-resident.

Replaces the reference's rank_bm25 ``BM25Okapi`` (reference:
src/retrieval.py:62-71 build, :117-143 query) and scikit-learn
``TfidfVectorizer(max_features=10000, ngram_range=(1,2))`` + cosine
(reference: src/retrieval.py:74-87, :145-172) with first-party builders
whose scoring runs on device through the padded-ELL match-accumulate
kernel (persian_rag_tpu.ops.sparse_scores).

Score parity:
* BM25 reproduces the Okapi formula with rank_bm25's exact constants and
  idf floor: k1=1.5, b=0.75, idf(t) = ln((N-df+0.5)/(df+0.5)), negative
  idfs replaced by epsilon(=0.25) * mean(raw idf).
* TF-IDF reproduces sklearn defaults: lowercase, token_pattern
  (?u)\\b\\w\\w+\\b, 1-2 grams, smooth_idf (ln((1+N)/(1+df))+1), l2 row
  normalization; query transform likewise, so cosine == dot.

All per-(doc, term) contributions are precomputed at build time into the
ELL value matrix, so a query is: hash terms host-side -> (ids, vals)
arrays -> one fused device kernel -> top-k ids.
"""
from __future__ import annotations

import functools
import json
import logging
import os
import re
from collections import Counter
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from persian_rag_tpu.ops.lexical_prefilter import (
    assign_buckets,
    build_ub_image,
    hash_queries,
    prefilter_topk,
)
from persian_rag_tpu.ops.sparse_scores import (
    hash_segments,
    sparse_scores_ref,
    sparse_topk,
    sparse_topk_hashed,
    sparse_topk_union,
    sparse_topk_union_hashed,
    sparse_topk_union_twopass,
)

_TOKEN_RE = re.compile(r"(?u)\b\w\w+\b")

logger = logging.getLogger(__name__)


def qw_exact_gate(qvals_np: np.ndarray) -> bool:
    """Whether a batch's query weights are bf16-EXACT small integers
    (BM25 term multiplicities), enabling the union kernels' 3-pass
    exact-split contraction (ops.sparse_scores._exact_split_dot)
    instead of HIGHEST's 6 MXU passes. Bounds the ABSOLUTE value
    (bf16 represents every integer of magnitude <= 256 exactly;
    a large negative integral weight would pass a max()-only check
    while rounding in bf16). TF-IDF's l2-normalized floats fail the
    integrality test and keep HIGHEST."""
    if qvals_np.size == 0:
        return True
    return bool(
        float(np.max(np.abs(qvals_np - np.rint(qvals_np)))) == 0.0
        and float(np.max(np.abs(qvals_np))) <= 128.0
    )


def whitespace_tokenize(text: str) -> List[str]:
    """The reference's BM25 tokenization (src/retrieval.py:66, :124)."""
    return text.split()


def sklearn_analyzer(text: str, ngram_range: Tuple[int, int] = (1, 2)) -> List[str]:
    """sklearn TfidfVectorizer's default analyzer: lowercase word
    tokens (>=2 chars), plus space-joined n-grams."""
    tokens = _TOKEN_RE.findall(text.lower())
    lo, hi = ngram_range
    out: List[str] = []
    for n in range(lo, hi + 1):
        if n == 1:
            out.extend(tokens)
        else:
            out.extend(
                " ".join(tokens[i : i + n]) for i in range(len(tokens) - n + 1)
            )
    return out


class _Bucket:
    """One doc-length bucket: ELL arrays plus the row -> global-doc map."""

    __slots__ = (
        "ids", "vals", "gids", "dev_ids", "dev_vals", "dev_gids",
        "dev_ids3", "dev_vals3", "n_actual"
    )

    def __init__(self, ids: np.ndarray, vals: np.ndarray, gids: np.ndarray):
        self.ids = ids
        self.vals = vals
        self.gids = gids
        self.dev_ids = None
        self.dev_vals = None
        self.dev_gids = None
        # hashed-segment copy consumed by the union kernel only (None
        # when the union-hash gate rejects the bucket)
        self.dev_ids3 = None
        self.dev_vals3 = None
        self.n_actual = ids.shape[0]


def _topk_one_layout(
    ids, vals, ids3, vals3, qids, qvals, kb, use_pallas, use_union,
    hash_ok: bool = True,
    two_pass: bool = False,
    n_union=None,
    want_ok: bool = False,
    qw_exact: bool = False,
):
    """Kernel choice for one ELL: union batches prefer the hashed-union
    copy (segment-grouped chunks scan Ls slots instead of L — measured
    1.45x at 200k over the flat union kernel); flat-kernel batches keep
    the layout the build gates picked for them. hash_ok carries the
    per-batch work-model verdict (small unions pay more in per-segment
    chunk padding than the Ls cut saves — measured 1M batch-64 zipf:
    hashed 55.0 ms vs flat union 35.7). two_pass (caller-gated: nonneg
    weights, N >= _TWOPASS_MIN_N, k <= _TWOPASS_MAX_K) routes union
    batches through the bf16-candidate + exact-rescore + proof path;
    n_union (traced scalar) tightens its proof bound. want_ok appends
    the per-query proof verdict to the return (None from non-two-pass
    kernels — exact answers carry no evidence either way)."""
    if use_union and two_pass:
        return sparse_topk_union_twopass(
            ids, vals,
            ids3 if hash_ok else None,
            vals3 if hash_ok else None,
            qids, qvals, kb,
            k_scan=_TWOPASS_K_SCAN, use_pallas=use_pallas,
            n_union=n_union, return_ok=want_ok,
        )
    if want_ok:
        s, i = _topk_one_layout(
            ids, vals, ids3, vals3, qids, qvals, kb, use_pallas,
            use_union, hash_ok, False, qw_exact=qw_exact,
        )
        return s, i, None
    if use_union and hash_ok and ids3 is not None:
        return sparse_topk_union_hashed(
            ids3, vals3, qids, qvals, kb, use_pallas=use_pallas,
            qw_exact=qw_exact,
        )
    if ids.ndim == 3:  # hashed-segment device layout
        return sparse_topk_hashed(
            ids, vals, qids, qvals, kb, use_pallas=use_pallas
        )
    if use_union:
        return sparse_topk_union(
            ids, vals, qids, qvals, kb, use_pallas=use_pallas,
            qw_exact=qw_exact,
        )
    return sparse_topk(ids, vals, qids, qvals, kb, use_pallas=use_pallas)


def _fused_bucket_topk_impl(
    bucket_ids,
    bucket_vals,
    bucket_gids,
    qids,
    qvals,
    kbs: Tuple[int, ...],
    k: int,
    use_pallas,
    use_union: bool = False,
    bucket_ids3=None,
    bucket_vals3=None,
    hash_ok: Tuple[bool, ...] = (),
    two_pass: Tuple[bool, ...] = (),
    n_union=None,
    want_ok: bool = False,
    qw_exact: bool = False,
):
    """All buckets' top-k plus the global merge in ONE device dispatch.

    A host-side per-bucket loop pays a dispatch + readback round trip per
    bucket (~tens of ms each over this environment's device relay), which
    dominated bucketed lexical search latency. Here every bucket's fused
    sparse_topk runs inside a single jit, candidate ids map to global doc
    ids on device, and the merge reproduces the host np.lexsort tie order
    (score desc, then lower global id) via a two-key lax.sort.

    bucket_ids3/bucket_vals3 optionally carry per-bucket hashed-segment
    copies for the union kernel (None entries fall back per bucket);
    hash_ok and two_pass are per-bucket per-batch static verdicts.
    want_ok additionally returns the per-query AND of the two-pass
    buckets' proof verdicts (None when no bucket ran two-pass) so the
    host can demote a proof-starved corpus off the two-pass path.
    """
    if bucket_ids3 is None:
        bucket_ids3 = (None,) * len(bucket_ids)
        bucket_vals3 = (None,) * len(bucket_vals)
    if not hash_ok:
        hash_ok = (True,) * len(bucket_ids)
    if not two_pass:
        two_pass = (False,) * len(bucket_ids)
    parts_s, parts_i, oks = [], [], []
    for ids, vals, gids, kb, ids3, vals3, h_ok, tp in zip(
        bucket_ids, bucket_vals, bucket_gids, kbs, bucket_ids3,
        bucket_vals3, hash_ok, two_pass
    ):
        out = _topk_one_layout(
            ids, vals, ids3, vals3, qids, qvals, kb, use_pallas,
            use_union, h_ok, tp, n_union, want_ok, qw_exact,
        )
        if want_ok:
            s, i, ok = out
            if ok is not None:
                oks.append(ok)
        else:
            s, i = out
        parts_s.append(s)
        parts_i.append(gids[i])
    cat_s = jnp.concatenate(parts_s, axis=1)
    cat_i = jnp.concatenate(parts_i, axis=1).astype(jnp.int32)
    _, gid_sorted, s_sorted = jax.lax.sort(
        (-cat_s, cat_i, cat_s), dimension=1, num_keys=2
    )
    kk = min(k, cat_s.shape[1])
    if want_ok:
        ok_all = functools.reduce(jnp.logical_and, oks) if oks else None
        return s_sorted[:, :kk], gid_sorted[:, :kk], ok_all
    return s_sorted[:, :kk], gid_sorted[:, :kk]


_fused_bucket_topk = functools.partial(
    jax.jit,
    static_argnames=(
        "kbs", "k", "use_pallas", "use_union", "hash_ok", "two_pass",
        "want_ok", "qw_exact",
    ),
)(_fused_bucket_topk_impl)  # n_union stays TRACED (a traced proof-bound
#   scalar in the packed wrappers; static would crash those callers)


# -- packed single-transfer serving wrappers -----------------------------------
#
# On the relay each host<->device array transfer costs a ~15-35 ms round
# trip REGARDLESS of size (measured: two (512, 8) query uploads 33 ms,
# two (512, 10) result fetches 65 ms against a 36 ms kernel). Serving
# therefore packs (qids, qvals) into ONE int32 upload and (scores, ids)
# into ONE int32 readback, bitcasting the f32 halves — bit-exact,
# arithmetic-free. The packed container must be INT32 on both legs:
# int32 ids bitcast to f32 are denormals (< 2^23 -> zero exponent) and
# the TPU f32 path flushes them to 0 (measured on chip: scores exact,
# ids all-zero when packed as f32). Integer transport preserves float
# bits exactly. Cuts the 200k BM25 batch-512 e2e from ~103 to ~73 ms.


@functools.partial(
    jax.jit,
    static_argnames=(
        "t", "kbs", "k", "use_pallas", "use_union", "hash_ok",
        "two_pass", "want_ok", "qw_exact",
    ),
)
def _packed_bucket_topk(
    packed_q,
    bucket_ids,
    bucket_vals,
    bucket_gids,
    t: int,
    kbs: Tuple[int, ...],
    k: int,
    use_pallas,
    use_union: bool = False,
    bucket_ids3=None,
    bucket_vals3=None,
    hash_ok: Tuple[bool, ...] = (),
    two_pass: Tuple[bool, ...] = (),
    want_ok: bool = False,
    qw_exact: bool = False,
):
    qids = packed_q[:, :t]
    qvals = jax.lax.bitcast_convert_type(
        packed_q[:, t : 2 * t], jnp.float32
    )
    n_union = (
        packed_q[0, 2 * t].astype(jnp.float32)
        if packed_q.shape[1] > 2 * t
        else None
    )
    out = _fused_bucket_topk_impl(
        bucket_ids, bucket_vals, bucket_gids, qids, qvals,
        kbs=kbs, k=k, use_pallas=use_pallas, use_union=use_union,
        bucket_ids3=bucket_ids3, bucket_vals3=bucket_vals3,
        hash_ok=hash_ok, two_pass=two_pass, n_union=n_union,
        want_ok=want_ok, qw_exact=qw_exact,
    )
    ok = None
    if want_ok:
        s, i, ok = out
    else:
        s, i = out
    cols = [jax.lax.bitcast_convert_type(s, jnp.int32), i]
    if ok is not None:
        cols.append(ok.astype(jnp.int32)[:, None])
    return jnp.concatenate(cols, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=(
        "t", "k", "use_pallas", "use_union", "hash_ok", "two_pass",
        "want_ok", "qw_exact",
    ),
)
def _packed_flat_topk(
    packed_q,
    dev_ids,
    dev_vals,
    t: int,
    k: int,
    use_pallas,
    use_union: bool = False,
    dev_ids3=None,
    dev_vals3=None,
    hash_ok: bool = True,
    two_pass: bool = False,
    want_ok: bool = False,
    qw_exact: bool = False,
):
    qids = packed_q[:, :t]
    qvals = jax.lax.bitcast_convert_type(
        packed_q[:, t : 2 * t], jnp.float32
    )
    n_union = (
        packed_q[0, 2 * t].astype(jnp.float32)
        if packed_q.shape[1] > 2 * t
        else None
    )
    out = _topk_one_layout(
        dev_ids, dev_vals, dev_ids3, dev_vals3, qids, qvals, k,
        use_pallas, use_union, hash_ok, two_pass, n_union, want_ok,
        qw_exact,
    )
    ok = None
    if want_ok:
        s, i, ok = out
    else:
        s, i = out
    cols = [jax.lax.bitcast_convert_type(s, jnp.int32), i]
    if ok is not None:
        cols.append(ok.astype(jnp.int32)[:, None])
    return jnp.concatenate(cols, axis=1)


def _pack_queries(
    qids_np: np.ndarray, qvals_np: np.ndarray, n_union=None
) -> np.ndarray:
    """[qids | bitcast(qvals) | n_union?] as one int32 upload. The
    optional n_union column rides the same transfer (each extra upload
    costs ~1.5 ms on the relay) and feeds the two-pass proof's
    runtime-tightened bound as a traced scalar — no recompile per
    distinct count."""
    cols = [qids_np, qvals_np.view(np.int32)]
    if n_union is not None:
        cols.append(
            np.full((qids_np.shape[0], 1), int(n_union), np.int32)
        )
    return np.concatenate(cols, axis=1)


def _unpack_topk(arr: np.ndarray, kk: int) -> Tuple[np.ndarray, np.ndarray]:
    return (
        np.ascontiguousarray(arr[:, :kk]).view(np.float32),
        np.ascontiguousarray(arr[:, kk : 2 * kk]),
    )


# The kernel streams ELL transposed (term slots on the 8-sublane axis),
# so bucket widths need only be multiples of 8 — fine-grained buckets
# directly cut VPU match work for short docs (the old doc-major layout
# lane-padded L to 128, which made boundaries below 128 worthless).
_BUCKET_BASE = 16

# Hashed-segment device layout: docs' terms partition into S = tid % S
# segments so a query term matches only its own (Ls, TN) segment —
# measured 1.7x over the flat kernel at 200k x L=47 single-bucket (the
# kernel is VPU-match-bound; scripts/bench_lexical_hashed.py). The gate
# is DATA-DRIVEN and strict: fine-grained length buckets already
# minimize L, and for narrow buckets (L<=49, Zipf 60-token docs) the
# repack's extra HBM stream outweighs the work win (measured 635 ms vs
# 333 ms at 1M — a strict gate keeps those flat). It engages for wide
# ELLs — realistic 150-word chunks (L~128+) and TF-IDF n-gram buckets
# (L up to ~1024). Single-chip only (the mesh path keeps 2-D shard_ell).
_HASH_MIN_L = 64       # below this, buckets stay flat outright
_HASH_MAX_WORK = 3.0   # require Ls <= L_pad / 3 (a >=3x match-work win)
_HASH_MAX_STORE = 2.5  # require S * Ls <= 2.5 * L_pad (HBM stream cap)

# Union-slot batch kernel gate (ops.sparse_scores.sparse_topk_union):
# the kernel's match work scales with the batch's UNIQUE term count U
# instead of B*T query slots, plus an MXU accumulation pass. Measured
# on chip at 200k x L=47, batch 512 x 8 slots: Zipf batch (U=782)
# 35.6 ms vs flat 59.7 (1.68x win); uniform batch (U=3818) 110.6 ms
# (0.54x — dedup buys nothing and the f32-precision MXU pass is pure
# overhead). Linear in populated 256-wide union chunks (~6.8 ms/chunk
# + 8.3 fixed there), crossover ~ U = 0.45 * B*T; the gate takes 0.4
# with the small-batch floor excluding regimes where the ~27 ms fixed
# dispatch dominates anyway.
_UNION_MIN_SLOTS = 1024   # b*t below this, flat is always fine
_UNION_MAX_FRAC = 0.4     # unique terms <= 40% of b*t slots

# Hashed-UNION copy: the union kernel's match work is U * L * TN per
# corpus tile; segment-grouped union chunks over a hashed (N, S, Ls)
# copy scan only ~L/S slots per chunk (measured on chip: 200k zipf
# L=47 35.3 -> 24.4 ms/512q, 1.45x; see scripts/
# bench_lexical_hashed_union.py and DESIGN.md). The copy is built
# ALONGSIDE the flat layout — the flat kernel keeps its own
# measured-optimal layout (hashed-flat LOSES 2x at 1M short docs) —
# so it costs ~2.7x the ELL bytes; the gate reserves it for corpora
# where batch-throughput lexical serving is the regime that matters.
_UNION_HASH_MIN_N = 65_536
_UNION_HASH_MIN_L = 24      # Ls ~ L/S + padding needs room to win
_UNION_HASH_SEGMENTS = 8    # measured sweet spot at L~47 (Ls=16)
_UNION_HASH_MAX_STORE = 4.0  # give up past 4x bytes (hash imbalance)

# Two-pass union serving (ops.sparse_scores.sparse_topk_union_twopass):
# bf16 candidate pass (one MXU pass vs HIGHEST's ~6) + exact f32
# rescore + residual proof + exact-kernel fallback. Engages only where
# the union kernel is MXU-bound (large N), on nonnegative-weight
# corpora (build-time check — the proof bound is a relative envelope),
# and small k (the stage-1 merge stays on the unrolled k<=32 path with
# over-retrieve headroom above k).
_TWOPASS_MIN_N = 65_536
_TWOPASS_MAX_K = 16
_TWOPASS_K_SCAN = 32

# Hashed-UB prefilter (ops.lexical_prefilter) storage gate: a bucketed
# corpus must densify into a unified (N, Lmax) gather ELL within this
# factor of its bucketed entry count (one pathological long doc must
# not inflate N*Lmax).
_PREFILTER_STORE_MAX = 3.0


class _Prefilter:
    """Device-resident hashed-UB prefilter state (see
    ops.lexical_prefilter)."""

    __slots__ = (
        "n_buckets", "k_scan", "term_map", "w16", "row_norm_max",
        "uids", "uvals",
    )

    def __init__(self, n_buckets, k_scan, term_map, w16, row_norm_max,
                 uids, uvals):
        self.n_buckets = n_buckets
        self.k_scan = k_scan
        self.term_map = term_map          # (V,) np.int32, host
        self.w16 = w16                    # (N, H) bf16, device
        self.row_norm_max = row_norm_max  # () f32, device
        self.uids = uids                  # (N, Lmax) int32, device
        self.uvals = uvals                # (N, Lmax) f32, device


def _bucket_width(length: int) -> int:
    w = _BUCKET_BASE
    while w < length:
        w *= 2
    return w


class _EllIndex:
    """Shared padded-ELL storage + device search (optionally row-sharded
    over a mesh's corpus axis).

    Documents are grouped into length buckets (widths 128*2^i) so one
    long document cannot inflate the whole (N, L) matrix: scoring work is
    sum_b N_b * L_b instead of N * max(L). With a single bucket the
    legacy flat layout (`doc_ids`/`doc_vals`) is kept as-is."""

    def __init__(self, mesh=None) -> None:
        self.vocab: Dict[str, int] = {}
        self.mesh = mesh
        self.doc_ids: Optional[np.ndarray] = None  # (N, L) int32, -1 pad
        self.doc_vals: Optional[np.ndarray] = None  # (N, L) float32
        self._dev_ids: Optional[jnp.ndarray] = None
        self._dev_vals: Optional[jnp.ndarray] = None
        self._dev_ids3: Optional[jnp.ndarray] = None  # union-hash copy
        self._dev_vals3: Optional[jnp.ndarray] = None
        self._buckets: Optional[List[_Bucket]] = None
        self._n = 0
        self._mesh_fused_cache: Dict = {}
        self._prefilter: Optional[_Prefilter] = None
        # None/False = exact ELL scan (default — KEEP IT unless you
        # have measured your corpus). "verified" = hashed-UB prefilter
        # + residual proof + full-scan fallback (always result-exact,
        # but the proof passes only 0-10% of queries on realistic
        # corpora, making it pure overhead there). "fast" = no
        # fallback: exact scores for the returned ids but unguarded
        # candidate recall — MEASURED R@10 0.02-0.35 at N=200k
        # (DESIGN.md). Opt-in only; both modes are dead ends at serving
        # scale and documented as such.
        self.prefilter: Optional[str] = None
        self._prefilter_failed = False
        # None = auto (union-slot kernel when the batch's unique-term
        # count clears _UNION_MAX_FRAC); "flat"/"union" force a kernel.
        self.batch_kernel: Optional[str] = None
        # "auto" = two-pass union serving (bf16 candidates + exact
        # rescore + proof + exact fallback) where the _TWOPASS_* gates
        # hold; "off" = always the exact HIGHEST-precision kernels.
        # DEFAULT OFF — chip-measured round 4 (scripts/
        # bench_lexical_twopass.py): the k_scan=32 candidate pass ALONE
        # costs 1.7x the full exact kernel (1M: 212 vs 122 ms/512q;
        # 200k: 44 vs 26) because the running merge's per-rank VPU
        # passes dominate, not MXU precision — so two-pass is 0.37-0.38x
        # wherever it engages, and its 98.2% per-query proof pass rate
        # still fails the whole-batch quantifier on ~every batch-512.
        # The machinery stays for the merge-free candidate redesign.
        self.two_pass: str = "off"
        self._nonneg = False  # all stored contributions >= 0 (build)
        # runtime two-pass demotion (mirrors DenseIndex._stage1_mode):
        # each two-pass dispatch reads its per-query proof verdicts back
        # in the packed result; a corpus whose live queries
        # majority-fail the proof TWOPASS_DEMOTE_STREAK dispatches in a
        # row pays (candidate pass + rescore + full exact kernel) per
        # dispatch — pure overhead — so it is flipped off the two-pass
        # path, sticky until the next build.
        self._twopass_demoted = False
        self._twopass_fail_streak = 0

    @property
    def ntotal(self) -> int:
        return self._n

    def _set_ell(self, ids: np.ndarray, vals: np.ndarray) -> None:
        """Single flat ELL (bucketing disabled or only one bucket)."""
        # rebuilt indexes invalidate jitted mesh closures, which bake the
        # previous build's bucket count / kbs / n_actuals
        self._mesh_fused_cache.clear()
        self._prefilter = None
        self._prefilter_failed = False
        self._twopass_demoted = False
        self._twopass_fail_streak = 0
        self.doc_ids, self.doc_vals = ids, vals
        self._buckets = None
        self._n = ids.shape[0]
        self._dev_ids3 = None
        self._dev_vals3 = None
        self._nonneg = bool(vals.size == 0 or float(vals.min()) >= 0.0)
        if self.mesh is not None:
            from persian_rag_tpu.parallel.sharded_lexical import shard_ell

            self._dev_ids, self._dev_vals, _ = shard_ell(
                jnp.asarray(ids), jnp.asarray(vals), self.mesh
            )
        else:
            (self._dev_ids, self._dev_vals,
             self._dev_ids3, self._dev_vals3) = self._device_ell(ids, vals)

    @staticmethod
    def _device_ell(ids: np.ndarray, vals: np.ndarray) -> Tuple[
        jnp.ndarray, jnp.ndarray, Optional[jnp.ndarray],
        Optional[jnp.ndarray],
    ]:
        """Single-chip device form of an ELL.

        Returns (primary_ids, primary_vals, union_ids3, union_vals3):
        the PRIMARY layout serves the flat/hashed per-term kernels —
        hashed-segment (N, S, Ls) when the ACTUAL repacked height
        clears the work/stream gates, flat (N, L) otherwise (candidate
        segment counts tried largest-first; larger S means less match
        work at more stream, bounded by the store gate). The UNION
        copy is the hashed layout the union kernel consumes: the
        primary itself when it is already 3-D, an extra hashed copy
        under the _UNION_HASH_* gates, or None (the union kernel then
        runs on the flat layout)."""
        el = ids.shape[1]
        el_pad = ((el + 7) // 8) * 8
        if el >= _HASH_MIN_L:
            for s in (16, 8, 4):
                ids3, vals3 = hash_segments(ids, vals, s)
                ls = ids3.shape[2]
                if (
                    ls * _HASH_MAX_WORK <= el_pad
                    and s * ls <= _HASH_MAX_STORE * el_pad
                ):
                    d_ids3 = jnp.asarray(ids3)
                    d_vals3 = jnp.asarray(vals3)
                    return d_ids3, d_vals3, d_ids3, d_vals3
        d_ids = jnp.asarray(ids)
        d_vals = jnp.asarray(vals)
        if (
            ids.shape[0] >= _UNION_HASH_MIN_N
            and el >= _UNION_HASH_MIN_L
        ):
            s = _UNION_HASH_SEGMENTS
            ids3, vals3 = hash_segments(ids, vals, s)
            ls = ids3.shape[2]
            if s * ls <= _UNION_HASH_MAX_STORE * el_pad and 2 * ls <= el_pad:
                return d_ids, d_vals, jnp.asarray(ids3), jnp.asarray(vals3)
        return d_ids, d_vals, None, None

    @staticmethod
    def _fill_ell(
        entries_list: List[List[Tuple[int, float]]], width: int
    ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(entries_list)
        ids = np.full((n, width), -1, np.int32)
        vals = np.zeros((n, width), np.float32)
        for di, entries in enumerate(entries_list):
            for li, (tid, v) in enumerate(entries):
                ids[di, li] = tid
                vals[di, li] = v
        return ids, vals

    def _set_buckets(self, buckets: List[_Bucket], n: int) -> None:
        self._mesh_fused_cache.clear()
        self._prefilter = None
        self._prefilter_failed = False
        self._twopass_demoted = False
        self._twopass_fail_streak = 0
        self.doc_ids = None
        self.doc_vals = None
        self._dev_ids = None
        self._dev_vals = None
        self._dev_ids3 = None
        self._dev_vals3 = None
        self._buckets = buckets
        self._n = n
        self._nonneg = all(
            b.vals.size == 0 or float(b.vals.min()) >= 0.0
            for b in buckets
        )
        for b in buckets:
            if self.mesh is not None:
                from persian_rag_tpu.parallel.sharded_lexical import shard_ell

                b.dev_ids, b.dev_vals, _ = shard_ell(
                    jnp.asarray(b.ids), jnp.asarray(b.vals), self.mesh
                )
            else:
                (b.dev_ids, b.dev_vals,
                 b.dev_ids3, b.dev_vals3) = self._device_ell(b.ids, b.vals)
            b.dev_gids = jnp.asarray(b.gids)

    def _set_ell_auto(self, ids: np.ndarray, vals: np.ndarray) -> None:
        """Bucket an already-filled (N, L) ELL (entries front-contiguous,
        -1 padding at the end — the native builder's layout) by row
        length; falls back to the flat layout with a single bucket."""
        lengths = (ids != -1).sum(axis=1)
        widths = sorted({_bucket_width(max(1, int(l))) for l in lengths})
        if len(widths) <= 1:
            self._set_ell(ids, vals)
            return
        buckets: List[_Bucket] = []
        row_widths = np.array(
            [_bucket_width(max(1, int(l))) for l in lengths]
        )
        for w in widths:
            sel = np.nonzero(row_widths == w)[0].astype(np.int32)
            wc = min(w, ids.shape[1])
            buckets.append(_Bucket(ids[sel, :wc], vals[sel, :wc], sel))
        self._set_buckets(buckets, ids.shape[0])

    def _build_ell(self, per_doc: List[List[Tuple[int, float]]]) -> None:
        n = len(per_doc)
        widths = sorted({_bucket_width(max(1, len(d))) for d in per_doc})
        if len(widths) <= 1:
            ell = max(1, max((len(d) for d in per_doc), default=1))
            ids, vals = self._fill_ell(per_doc, ell)
            self._set_ell(ids, vals)
            return
        buckets: List[_Bucket] = []
        # clamp the top bucket to the corpus-wide max length (same rule
        # as _set_ell_auto applies to the native builder's ELL, keeping
        # both build paths' bucket layouts identical)
        global_max = max(max(1, len(d)) for d in per_doc)
        for w in widths:
            sel = [
                di for di, d in enumerate(per_doc)
                if _bucket_width(max(1, len(d))) == w
            ]
            ids, vals = self._fill_ell(
                [per_doc[di] for di in sel], min(w, global_max)
            )
            buckets.append(_Bucket(ids, vals, np.asarray(sel, np.int32)))
        self._set_buckets(buckets, n)

    def _encode_queries(
        self, queries_terms: Sequence[List[Tuple[int, float]]]
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        # Size the query slot dimension to the batch's actual max term
        # count (padded to a multiple of 8 for shape-bucket reuse) — a
        # fixed cap would silently truncate long queries and corrupt
        # scores (e.g. TF-IDF (1,2)-gram queries exceed 64 slots at ~33
        # words).
        b = len(queries_terms)
        t_raw = max(1, max((len(q) for q in queries_terms), default=1))
        t = ((t_raw + 7) // 8) * 8
        qids = np.full((b, t), -1, np.int32)
        qvals = np.zeros((b, t), np.float32)
        for bi, terms in enumerate(queries_terms):
            for ti, (tid, v) in enumerate(terms):
                qids[bi, ti] = tid
                qvals[bi, ti] = v
        return qids, qvals

    # -- hashed-UB prefilter (ops.lexical_prefilter) -----------------------

    def _unified_ell_host(
        self,
    ) -> Tuple[Optional[np.ndarray], Optional[np.ndarray]]:
        """Host (N, Lmax) gather ELL: the flat layout as-is, or buckets
        densified into one matrix (None when a long-doc outlier would
        blow the storage gate)."""
        if self._buckets is None:
            return self.doc_ids, self.doc_vals
        lmax = max(b.ids.shape[1] for b in self._buckets)
        entries = sum(b.ids.size for b in self._buckets)
        if self._n * lmax > _PREFILTER_STORE_MAX * entries:
            return None, None
        ids = np.full((self._n, lmax), -1, np.int32)
        vals = np.zeros((self._n, lmax), np.float32)
        for b in self._buckets:
            w = b.ids.shape[1]
            ids[b.gids, :w] = b.ids
            vals[b.gids, :w] = b.vals
        return ids, vals

    def build_prefilter(
        self,
        n_buckets: int = 1024,
        k_scan: int = 256,
        dedicated_frac: float = 0.5,
    ) -> bool:
        """Build the hashed-UB prefilter (see ops.lexical_prefilter).

        Returns False (and leaves search on the ELL scan) when the
        corpus is mesh-sharded, a long-doc outlier fails the unified-ELL
        storage gate, or any contribution is negative (a degenerate
        BM25 idf floor would break the upper-bound property)."""
        if self.mesh is not None or self._n == 0:
            return False
        ids, vals = self._unified_ell_host()
        if ids is None:
            return False
        if ids.shape[1] > 512:
            # the rescore gathers (B, k_scan, Lmax) candidate rows; very
            # wide ELLs (TF-IDF n-gram corpora reach L~1024) would put
            # ~1GB on that gather — stay on the scan there
            return False
        if float(vals.min()) < 0.0:
            return False
        df = np.bincount(
            ids[ids >= 0].ravel(), minlength=max(len(self.vocab), 1)
        )
        term_map = assign_buckets(df, n_buckets, dedicated_frac)
        w16, row_norm_max = build_ub_image(ids, vals, term_map, n_buckets)
        self._prefilter = _Prefilter(
            n_buckets,
            k_scan,
            term_map,
            jnp.asarray(w16, jnp.bfloat16),  # exact: w16 holds bf16 values
            jnp.float32(row_norm_max),
            jnp.asarray(ids),
            jnp.asarray(vals),
        )
        return True

    def _prefilter_search(
        self,
        qids: np.ndarray,
        qvals: np.ndarray,
        k: int,
        use_pallas: Optional[bool],
    ) -> Tuple[np.ndarray, np.ndarray]:
        pf = self._prefilter
        qh = hash_queries(qids, qvals, pf.term_map, pf.n_buckets)
        on_tpu = jax.default_backend() == "tpu"
        s, i = prefilter_topk(
            jnp.asarray(qh),
            pf.w16,
            pf.row_norm_max,
            pf.uids,
            pf.uvals,
            jnp.asarray(qids),
            jnp.asarray(qvals),
            k,
            k_scan=pf.k_scan,
            interpret=not on_tpu,
            use_pallas=use_pallas,
            fallback=self.prefilter != "fast",
        )
        return np.asarray(s), np.asarray(i)

    def _topk_one_ell(
        self,
        dev_ids,
        dev_vals,
        qids,
        qvals,
        k: int,
        n_actual: int,
        use_pallas: Optional[bool],
        use_union: bool = False,
    ) -> Tuple[np.ndarray, np.ndarray]:
        if self.mesh is not None:
            from persian_rag_tpu.parallel.sharded_lexical import (
                sharded_sparse_topk,
            )

            s, i = sharded_sparse_topk(
                dev_ids, dev_vals, qids, qvals, k, n_actual, self.mesh,
                use_pallas=use_pallas, use_union=use_union,
            )
        elif dev_ids.ndim == 3:  # hashed-segment layout
            s, i = sparse_topk_hashed(
                dev_ids, dev_vals, qids, qvals, k, use_pallas=use_pallas
            )
        elif use_union:
            s, i = sparse_topk_union(
                dev_ids, dev_vals, qids, qvals, k, use_pallas=use_pallas
            )
        else:
            s, i = sparse_topk(
                dev_ids, dev_vals, qids, qvals, k, use_pallas=use_pallas
            )
        return np.asarray(s), np.asarray(i)

    @staticmethod
    def _hash_work_ok(
        uids: np.ndarray, l_pad: int, ids3
    ) -> bool:
        """Per-batch flat-union vs hashed-union work model (host-side,
        microseconds). The hashed kernel pays per-SEGMENT chunk padding:
        a small union (e.g. 167 terms over 8 segments) still occupies
        8 x UC=128 slots, so its UC*Ls match work exceeds the flat
        kernel's ceil(U/256)*256 x L — measured 1M batch-64 zipf:
        hashed 55.0 ms vs flat union 35.7. Pick hashed only when
        padded_hashed_slots * Ls <= padded_flat_slots * L_pad."""
        if ids3 is None:
            return False
        s_n, ls = ids3.shape[1], ids3.shape[2]
        u = max(len(uids), 1)
        flat_slots = max(-(-u // 256) * 256, 256)
        seg_counts = np.bincount(uids % s_n, minlength=s_n)
        hashed_slots = int((-(-seg_counts // 128) * 128).sum())
        return hashed_slots * ls <= flat_slots * l_pad

    def _hash_ok_flags(self, qids_np: np.ndarray):
        """(flat_flag, per-bucket tuple) of hashed-union verdicts for
        this batch."""
        uids = np.unique(qids_np[qids_np >= 0]).astype(np.int64)

        def l_pad(ids):
            return ((ids.shape[1] + 7) // 8) * 8

        if self._buckets is None:
            flat = (
                self._hash_work_ok(
                    uids, l_pad(self.doc_ids), self._dev_ids3
                )
                if self._dev_ids3 is not None and self.doc_ids is not None
                else self._dev_ids3 is not None
            )
            return flat, ()
        return True, tuple(
            self._hash_work_ok(uids, l_pad(b.ids), b.dev_ids3)
            if b.dev_ids3 is not None
            else False
            for b in self._buckets
        )

    def _union_gate(
        self, qids_np: np.ndarray, n_unique: Optional[int] = None
    ) -> bool:
        """Host-side per-dispatch kernel choice: the union-slot kernel
        wins when the batch shares vocabulary (see _UNION_MAX_FRAC).
        np.unique over the (B, T) id matrix costs microseconds next to
        the ~27 ms relay dispatch floor. Near-tie caveat: union scores
        accumulate in a different f32 reduction order than the flat
        kernel's (MXU HIGHEST dot vs sequential VPU adds) — measured
        max |ds| 7.6e-06 at 200k with ~2% of top-10 ids flipping on
        sub-1e-5 near-ties; both orders sit inside the f32 envelope of
        the rank_bm25 float64 formula, and exact ties (duplicate docs)
        keep the deterministic lower-id-first order in both kernels."""
        if self.batch_kernel == "union":
            return True
        if self.batch_kernel is not None:
            return False
        b, t = qids_np.shape
        if b * t < _UNION_MIN_SLOTS:
            return False
        if n_unique is None:
            n_unique = len(np.unique(qids_np[qids_np >= 0]))
        return n_unique <= _UNION_MAX_FRAC * b * t

    TWOPASS_DEMOTE_STREAK = 3

    def _note_twopass_verdict(self, ok: Optional[np.ndarray]) -> None:
        """Sticky two-pass demotion from the live proof-verdict stream
        (the lexical analog of DenseIndex._note_proof_verdict): a
        dispatch where the MAJORITY of queries failed the residual
        proof counts toward a streak; TWOPASS_DEMOTE_STREAK consecutive
        such dispatches flip two-pass off for this build (every one of
        them paid candidates + rescore + the full exact fallback, so
        staying optimistic is pure overhead). ok=None means no
        two-pass regime served the call — no evidence, streak kept."""
        if ok is None or ok.size == 0:
            return
        if float(ok.mean()) < 0.5:
            self._twopass_fail_streak += 1
            if (
                self._twopass_fail_streak >= self.TWOPASS_DEMOTE_STREAK
                and not self._twopass_demoted
            ):
                logger.warning(
                    "lexical two-pass proof majority-failed %d "
                    "consecutive dispatches: demoting to the exact "
                    "union kernel for this corpus",
                    self._twopass_fail_streak,
                )
                self._twopass_demoted = True
        else:
            self._twopass_fail_streak = 0

    def _search_encoded(
        self,
        queries_terms: Sequence[List[Tuple[int, float]]],
        k: int,
        use_pallas: Optional[bool] = None,
    ) -> Tuple[np.ndarray, np.ndarray]:
        qids_np, qvals_np = self._encode_queries(queries_terms)
        if self.mesh is None and self.prefilter in ("fast", "verified"):
            if self._prefilter is None and not self._prefilter_failed:
                self._prefilter_failed = not self.build_prefilter()
            pf = self._prefilter
            if pf is not None and k <= pf.k_scan:
                return self._prefilter_search(qids_np, qvals_np, k, use_pallas)
        n_unique = len(np.unique(qids_np[qids_np >= 0]))
        use_union = self._union_gate(qids_np, n_unique=n_unique)
        # Two-pass union serving gate (see _TWOPASS_* and
        # ops.sparse_scores.sparse_topk_union_twopass): the proof's
        # relative envelope requires every contribution — stored AND
        # query-side — to be nonnegative; _twopass_demoted is the
        # sticky runtime verdict from earlier proof-starved dispatches.
        two_pass_ok = (
            use_union
            and self.two_pass == "auto"
            and not self._twopass_demoted
            and self._nonneg
            and k <= _TWOPASS_MAX_K
            and bool(qvals_np.min(initial=0.0) >= 0.0)
        )
        qw_exact = qw_exact_gate(qvals_np)
        if self.mesh is None:
            # single-chip serving: one packed upload, one packed readback
            # (each relay transfer costs a fixed ~15-35 ms round trip);
            # the n_union column tightens the two-pass proof bound and
            # rides the same upload.
            t = qids_np.shape[1]
            dev_q = jnp.asarray(
                _pack_queries(qids_np, qvals_np, n_union=n_unique)
            )
            flat_hash_ok, bucket_hash_ok = (
                self._hash_ok_flags(qids_np) if use_union else (True, ())
            )
            if self._buckets is None:
                tp = two_pass_ok and self._n >= _TWOPASS_MIN_N
                out = _packed_flat_topk(
                    dev_q, self._dev_ids, self._dev_vals, t=t, k=k,
                    use_pallas=use_pallas, use_union=use_union,
                    dev_ids3=self._dev_ids3, dev_vals3=self._dev_vals3,
                    hash_ok=flat_hash_ok,
                    two_pass=tp,
                    want_ok=tp,
                    qw_exact=qw_exact,
                )
                arr = np.asarray(out)
                if arr.shape[1] > 2 * k:
                    self._note_twopass_verdict(arr[:, 2 * k] != 0)
                return _unpack_topk(arr, k)
            kbs = tuple(min(k, b.n_actual) for b in self._buckets)
            tps = tuple(
                two_pass_ok and b.n_actual >= _TWOPASS_MIN_N
                for b in self._buckets
            )
            out = _packed_bucket_topk(
                dev_q,
                tuple(b.dev_ids for b in self._buckets),
                tuple(b.dev_vals for b in self._buckets),
                tuple(b.dev_gids for b in self._buckets),
                t=t, kbs=kbs, k=k,
                use_pallas=use_pallas, use_union=use_union,
                bucket_ids3=tuple(b.dev_ids3 for b in self._buckets),
                bucket_vals3=tuple(b.dev_vals3 for b in self._buckets),
                hash_ok=bucket_hash_ok,
                two_pass=tps,
                want_ok=any(tps),
                qw_exact=qw_exact,
            )
            arr = np.asarray(out)
            kk = min(k, sum(kbs))
            if arr.shape[1] > 2 * kk:
                self._note_twopass_verdict(arr[:, 2 * kk] != 0)
            return _unpack_topk(arr, kk)
        # mesh paths: per-shard kernels + collective merges (transfer
        # packing matters less — the dispatch is the sharded kernel)
        qids, qvals = jnp.asarray(qids_np), jnp.asarray(qvals_np)
        if self._buckets is None:
            return self._topk_one_ell(
                self._dev_ids, self._dev_vals, qids, qvals, k, self.ntotal,
                use_pallas, use_union,
            )
        # Bucketed: per-bucket top-min(k, N_b) candidates, ids mapped to
        # global docs, merged with the same lower-id-first tie order as
        # the flat scan — ALL buckets and the merge in one jitted
        # dispatch (a host-side per-bucket loop pays a dispatch +
        # readback round trip per bucket).
        s, i = self._sharded_bucket_topk(
            qids, qvals, k, use_pallas, use_union
        )
        return np.asarray(s), np.asarray(i)

    def _sharded_bucket_topk(self, qids, qvals, k, use_pallas,
                             use_union=False):
        """All buckets' mesh-sharded top-k plus the global merge in one
        jitted dispatch (cached per (k, query shape)). Degenerate short
        results carry id -1 at NEG_INF score (the old host merge mapped
        a shard's invalid slots through gids[-1])."""
        from persian_rag_tpu.parallel.sharded_lexical import (
            sharded_sparse_topk,
        )

        key = (k, qids.shape, use_pallas, use_union)
        fn = self._mesh_fused_cache.get(key)
        if fn is None:
            buckets, mesh = self._buckets, self.mesh
            kbs = tuple(min(k, b.n_actual) for b in buckets)
            n_actuals = tuple(b.n_actual for b in buckets)

            def run(qi, qv, *arrays):
                parts_s, parts_i = [], []
                for bi in range(len(buckets)):
                    ids_s, vals_s, gids_d = arrays[3 * bi: 3 * bi + 3]
                    s, i = sharded_sparse_topk(
                        ids_s, vals_s, qi, qv, kbs[bi], n_actuals[bi],
                        mesh, use_pallas=use_pallas, use_union=use_union,
                    )
                    gid = jnp.where(
                        i >= 0, gids_d[jnp.maximum(i, 0)], -1
                    )
                    parts_s.append(s)
                    parts_i.append(gid)
                cat_s = jnp.concatenate(parts_s, axis=1)
                cat_i = jnp.concatenate(parts_i, axis=1).astype(jnp.int32)
                _, gid_sorted, s_sorted = jax.lax.sort(
                    (-cat_s, cat_i, cat_s), dimension=1, num_keys=2
                )
                kk = min(k, cat_s.shape[1])
                return s_sorted[:, :kk], gid_sorted[:, :kk]

            fn = jax.jit(run)
            self._mesh_fused_cache[key] = fn
        arrays = [
            x
            for b in self._buckets
            for x in (b.dev_ids, b.dev_vals, b.dev_gids)
        ]
        return fn(qids, qvals, *arrays)

    def device_arrays(self) -> Tuple:
        """Device arrays for jittable single-chip search, to be passed
        into an outer jit as traced ARGUMENTS (closures over large
        device constants break remote compile paths). Flat layout:
        (dev_ids, dev_vals, dev_ids3, dev_vals3); bucketed: (ids, vals,
        gids, ids3, vals3) per bucket — the ids3/vals3 slots carry the
        hashed-union copies (None when ungated; None is a valid jit
        argument as an empty pytree). Pair with `bucket_kbs(k)` for the
        matching static metadata."""
        if self.mesh is not None:
            raise ValueError("device_arrays is single-chip; use search()")
        if self._buckets is None:
            return (
                self._dev_ids, self._dev_vals,
                self._dev_ids3, self._dev_vals3,
            )
        return tuple(
            x
            for b in self._buckets
            for x in (b.dev_ids, b.dev_vals, b.dev_gids,
                      b.dev_ids3, b.dev_vals3)
        )

    def bucket_kbs(self, k: int) -> Tuple[int, ...]:
        """Per-bucket top-k widths (static jit metadata); empty tuple
        for the flat single-ELL layout."""
        if self._buckets is None:
            return ()
        return tuple(min(k, b.n_actual) for b in self._buckets)

    def _scores_encoded(
        self, queries_terms: Sequence[List[Tuple[int, float]]]
    ) -> np.ndarray:
        qids_np, qvals_np = self._encode_queries(queries_terms)
        qids, qvals = jnp.asarray(qids_np), jnp.asarray(qvals_np)
        if self._buckets is None:
            # dense scoring reads the host ELL (the device arrays may be
            # in the 3-D hashed-segment layout)
            dev_i, dev_v = self._dev_ids, self._dev_vals
            if dev_i is None or dev_i.ndim == 3:
                dev_i = jnp.asarray(self.doc_ids)
                dev_v = jnp.asarray(self.doc_vals)
            scores = np.asarray(
                sparse_scores_ref(dev_i, dev_v, qids, qvals)
            )
            # With a mesh, _dev_ids is padded to a shard multiple; trim the
            # pad rows so get_scores always returns exactly (N,) per query.
            return scores[:, : self.ntotal]
        out = np.zeros((len(queries_terms), self.ntotal), np.float32)
        for b in self._buckets:
            s = np.asarray(
                sparse_scores_ref(
                    jnp.asarray(b.ids), jnp.asarray(b.vals), qids, qvals
                )
            )
            out[:, b.gids] = s
        return out

    def _save_arrays(self, path: str, extra: Dict) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        arrays: Dict[str, np.ndarray] = {}
        if self._buckets is None:
            arrays["doc_ids"] = self.doc_ids
            arrays["doc_vals"] = self.doc_vals
        else:
            for bi, b in enumerate(self._buckets):
                arrays[f"bucket_ids_{bi}"] = b.ids
                arrays[f"bucket_vals_{bi}"] = b.vals
                arrays[f"bucket_gids_{bi}"] = b.gids
        np.savez(
            path if path.endswith(".npz") else path + ".npz", **arrays
        )
        meta = dict(extra)
        meta["vocab"] = self.vocab
        if self._buckets is not None:
            meta["n_buckets"] = len(self._buckets)
            meta["ntotal"] = self._n
        base = path[:-4] if path.endswith(".npz") else path
        with open(base + ".meta.json", "w", encoding="utf-8") as f:
            json.dump(meta, f, ensure_ascii=False)

    def _load_arrays(self, path: str) -> Dict:
        npz = path if path.endswith(".npz") else path + ".npz"
        data = np.load(npz)
        base = path[:-4] if path.endswith(".npz") else path
        with open(base + ".meta.json", "r", encoding="utf-8") as f:
            meta = json.load(f)
        if "n_buckets" in meta:
            buckets = [
                _Bucket(
                    data[f"bucket_ids_{bi}"],
                    data[f"bucket_vals_{bi}"],
                    data[f"bucket_gids_{bi}"],
                )
                for bi in range(meta.pop("n_buckets"))
            ]
            self._set_buckets(buckets, meta.pop("ntotal"))
        else:
            self._set_ell(data["doc_ids"], data["doc_vals"])
        self.vocab = meta.pop("vocab")
        return meta


class BM25Index(_EllIndex):
    """Okapi BM25 with rank_bm25-identical scores."""

    def __init__(
        self,
        k1: float = 1.5,
        b: float = 0.75,
        epsilon: float = 0.25,
        mesh=None,
    ):
        super().__init__(mesh=mesh)
        self.k1 = k1
        self.b = b
        self.epsilon = epsilon

    def build(
        self, texts: Sequence[str], use_native: Optional[bool] = None
    ) -> "BM25Index":
        """Build the index. The host-side hot loop (tokenize -> vocab ->
        df/tf -> ELL fill) runs in the C++ builder
        (persian_rag_tpu/native/lexical_native.cpp) when available, with
        a bit-identical pure-Python fallback."""
        if use_native is not False:
            try:
                from persian_rag_tpu import native

                if native.available():
                    # re-join on single spaces so the C++ ASCII-whitespace
                    # splitter sees exactly Python str.split() tokens
                    joined = [" ".join(whitespace_tokenize(t)) for t in texts]
                    ids, vals, vocab, idf, avgdl = native.bm25_build_ell(
                        joined, self.k1, self.b, self.epsilon
                    )
                    self.vocab = vocab
                    self.idf = idf
                    self._avgdl = avgdl
                    self._set_ell_auto(ids, vals)
                    return self
            except Exception:
                if use_native:  # explicitly requested
                    raise
        return self._build_python(texts)

    def _build_python(self, texts: Sequence[str]) -> "BM25Index":
        tokenized = [whitespace_tokenize(t) for t in texts]
        n = len(tokenized)
        if n == 0:
            raise ValueError("empty corpus")
        doc_lens = np.array([len(t) for t in tokenized], np.float64)
        avgdl = doc_lens.mean() if n else 0.0

        doc_counters = [Counter(tokens) for tokens in tokenized]
        df: Counter = Counter()
        for c in doc_counters:
            df.update(c.keys())
        self.vocab = {term: i for i, term in enumerate(df.keys())}

        raw_idf = {}
        idf_sum = 0.0
        negative = []
        for term, freq in df.items():
            idf = np.log(n - freq + 0.5) - np.log(freq + 0.5)
            raw_idf[term] = idf
            idf_sum += idf
            if idf < 0:
                negative.append(term)
        average_idf = idf_sum / max(len(raw_idf), 1)
        eps = self.epsilon * average_idf
        for term in negative:
            raw_idf[term] = eps
        self.idf = raw_idf

        per_doc: List[List[Tuple[int, float]]] = []
        for di, counter in enumerate(doc_counters):
            dl = doc_lens[di]
            denom_norm = self.k1 * (1.0 - self.b + self.b * dl / max(avgdl, 1e-12))
            entries = []
            for term, tf in counter.items():
                contrib = raw_idf[term] * tf * (self.k1 + 1.0) / (tf + denom_norm)
                entries.append((self.vocab[term], float(contrib)))
            per_doc.append(entries)
        self._build_ell(per_doc)
        self._avgdl = float(avgdl)
        return self

    def _query_terms(self, query: str) -> List[Tuple[int, float]]:
        counts = Counter(whitespace_tokenize(query))
        # Out-of-vocabulary query terms contribute 0 (rank_bm25 behavior).
        return [
            (self.vocab[t], float(m)) for t, m in counts.items() if t in self.vocab
        ]

    def get_scores(self, query: str) -> np.ndarray:
        """(N,) BM25 scores, equal to rank_bm25.BM25Okapi.get_scores."""
        return self._scores_encoded([self._query_terms(query)])[0]

    def search(
        self, queries: Sequence[str], k: int, use_pallas: Optional[bool] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        terms = [self._query_terms(q) for q in queries]
        return self._search_encoded(terms, min(k, self.ntotal), use_pallas)

    def save(self, path: str) -> None:
        self._save_arrays(
            path,
            {
                "type": "bm25",
                "k1": self.k1,
                "b": self.b,
                "epsilon": self.epsilon,
                "avgdl": self._avgdl,
                "idf": self.idf,
            },
        )

    @classmethod
    def load(cls, path: str) -> "BM25Index":
        index = cls()
        meta = index._load_arrays(path)
        index.k1 = meta["k1"]
        index.b = meta["b"]
        index.epsilon = meta["epsilon"]
        index._avgdl = meta["avgdl"]
        index.idf = meta["idf"]
        return index


class TfidfIndex(_EllIndex):
    """TF-IDF retrieval with sklearn-identical weighting and cosine scores."""

    def __init__(
        self,
        max_features: Optional[int] = 10000,
        ngram_range: Tuple[int, int] = (1, 2),
        mesh=None,
    ):
        super().__init__(mesh=mesh)
        self.max_features = max_features
        self.ngram_range = tuple(ngram_range)

    def build(self, texts: Sequence[str]) -> "TfidfIndex":
        analyzed = [sklearn_analyzer(t, self.ngram_range) for t in texts]
        n = len(analyzed)
        if n == 0:
            raise ValueError("empty corpus")
        doc_counters = [Counter(terms) for terms in analyzed]

        term_freq: Counter = Counter()
        df: Counter = Counter()
        for c in doc_counters:
            term_freq.update(c)
            df.update(c.keys())

        terms = sorted(df.keys())
        if self.max_features is not None and len(terms) > self.max_features:
            # sklearn _limit_features keeps the max_features terms with the
            # highest total count, using np.argsort(-tfs) over the
            # alphabetically-sorted vocabulary. Replicate with the same
            # (unstable) argsort so tie resolution matches bit-for-bit.
            tfs = np.array([term_freq[t] for t in terms], dtype=np.int64)
            keep = np.argsort(-tfs)[: self.max_features]
            terms = sorted(terms[i] for i in keep)
        self.vocab = {t: i for i, t in enumerate(terms)}

        idf = np.zeros(len(terms), np.float64)
        for t, i in self.vocab.items():
            idf[i] = np.log((1.0 + n) / (1.0 + df[t])) + 1.0
        self._idf = idf

        per_doc: List[List[Tuple[int, float]]] = []
        for counter in doc_counters:
            entries = [
                (self.vocab[t], tf * idf[self.vocab[t]])
                for t, tf in counter.items()
                if t in self.vocab
            ]
            norm = np.sqrt(sum(v * v for _, v in entries))
            if norm > 0:
                entries = [(tid, float(v / norm)) for tid, v in entries]
            per_doc.append(entries)
        self._build_ell(per_doc)
        return self

    def _query_terms(self, query: str) -> List[Tuple[int, float]]:
        counts = Counter(sklearn_analyzer(query, self.ngram_range))
        entries = [
            (self.vocab[t], tf * self._idf[self.vocab[t]])
            for t, tf in counts.items()
            if t in self.vocab
        ]
        norm = np.sqrt(sum(v * v for _, v in entries))
        if norm > 0:
            entries = [(tid, float(v / norm)) for tid, v in entries]
        return entries

    def get_scores(self, query: str) -> np.ndarray:
        """(N,) cosine similarities, equal to sklearn cosine_similarity
        over TfidfVectorizer rows."""
        return self._scores_encoded([self._query_terms(query)])[0]

    def search(
        self, queries: Sequence[str], k: int, use_pallas: Optional[bool] = None
    ) -> Tuple[np.ndarray, np.ndarray]:
        terms = [self._query_terms(q) for q in queries]
        return self._search_encoded(terms, min(k, self.ntotal), use_pallas)

    def save(self, path: str) -> None:
        self._save_arrays(
            path,
            {
                "type": "tfidf",
                "max_features": self.max_features,
                "ngram_range": list(self.ngram_range),
                "idf": self._idf.tolist(),
            },
        )

    @classmethod
    def load(cls, path: str) -> "TfidfIndex":
        index = cls()
        meta = index._load_arrays(path)
        index.max_features = meta["max_features"]
        index.ngram_range = tuple(meta["ngram_range"])
        index._idf = np.asarray(meta["idf"])
        return index
