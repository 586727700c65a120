"""Distributed model training / scoring over the corpus — the quality
classifier a web-scale curation pipeline trains on its OWN rule labels.

``quality_classifier`` is the CCNet/GPT-3-appendix-A pattern (Wenzek et al.
2020 §3.4; Brown et al. 2020): a LINEAR classifier learns to imitate a
quality gate — here the repo's Gopher rule (weak supervision), so the whole
loop is self-contained and deterministic.  In production the same machinery
retrains against a human-curated positive set; here its scores and the
training curve are the checked artifacts.

Features (the wide-model recipe for linear learners):
  * hashed unigram+bigram counts, L1-normalized and scaled by _GRAM_SCALE —
    the EXACT hash family of dsir_importance_weights (content signal);
  * a one-hot CAPPED WORD COUNT block (_NW_CAP slots) — textbook feature
    discretization: threshold-shaped rules (Gopher's n_words >= 50) are a
    step function over slots, learnable with moderate weights, where a
    continuous length feature needs sigmoid-saturating magnitudes that
    full-batch AdaGrad reaches only after ~10^4 iterations (measured);
  * a dense document-statistics block (log length, mean word length,
    symbol ratio, alpha fraction, stop-word count — the RefinedWeb-style
    stats signal), each scaled to ~[0, 1].

Reference parity note: the reference (SharePointCrawler) has no training
loop — this is part of the brief's "operations a large-scale training-data
pipeline would need" surface, alongside dsir/lm_perplexity in
engine/ops/text.py.

Determinism discipline (the lm_perplexity idiom, applied to training):
every CROSS-PARTITION sum is an integer sum of per-document contributions
rounded to int64 micros BEFORE leaving the document, so block boundaries
and reduce order can never change a bit.  Weights live as int64 micros; the
optimizer is full-batch AdaGrad (Duchi et al. 2011 — per-feature adaptive
steps fix the hashed-gram vs one-hot vs dense scale mismatch that plain GD
oscillates on), and its accumulator lives ONLY on the driver as a
single-threaded float64 function of the exact integer gradient sums —
deterministic regardless of parallelism.

Scale shape (per iteration): one gradient TASK per pinned Arrow block of a
materialized narrow feature table (doc_id, label, ng, cnw, dv:list<int64>[5],
fb:list<int64>, fc:list<int64> — the bm25 tf-table trade: both training and
scoring consume it, and re-tokenizing the corpus ``iters`` times costs far
more), each returning a constant-size integer partial (W ints + 3 scalars,
W ≈ 1.3k) reduced on the driver.  The ~10 KB weight vector is the only
per-iteration broadcast.  No shuffle ever touches the text or the gram
stream — the same all-reduce shape as hits_docs, with the model, not the
graph, as the iterated state; ``_train`` documents why the loop is raw
tasks over the block refs rather than ``iters`` separate Dataset runs.
"""
from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .dedup import _POS_MULT, _mix64
from .text import _docs, _md5_token_hashes, gopher_flags_batch

# Gram features are L1-normalized counts scaled by _GRAM_SCALE so their
# per-feature gradients are commensurate with the one-hot/dense blocks.
_GRAM_SCALE = 16
_NW_CAP = 256  # one-hot slots for min(n_words, _NW_CAP - 1)
_N_DENSE = 5
# weight layout helpers: [0, n_feat) grams; [n_feat, n_feat+_NW_CAP) word
# count one-hot; n_feat+_NW_CAP bias; then _N_DENSE dense stats.


def _n_weights(n_feat: int) -> int:
    return n_feat + _NW_CAP + 1 + _N_DENSE


# Loss/metric sentinel rows in the gradient-partial table.
_J_LOSS = -1  # sum of per-doc cross-entropy, int64 micros
_J_CORRECT = -2  # docs whose sign(logit) matches the label
_J_DOCS = -3  # doc count (constant across iterations; carried for free)


def _doc_feature_batch(t: pa.Table, n_feat: int) -> pa.Table:
    """One Arrow batch (doc_id, text) -> the narrow feature table.

    Gram features are hashed unigram + bigram occurrence counts over
    ``text.lower().split()`` tokens — the EXACT hash family of
    dsir_importance_weights (md5-prefix-64 token hash, splitmix64 positional
    combine, mod n_feat), so the two ops can never drift.  Per doc the
    (bucket, count) pairs are aggregated and sorted by bucket — the per-doc
    representation is a pure function of the text, independent of batching.
    ``cnw`` is min(n_words, _NW_CAP-1); ``dv`` is the 5 dense stats in int64
    micros.  Labels AND stats come from the shared ``gopher_flags_batch``
    kernel, so rule and label can never drift.
    """
    gf = gopher_flags_batch(t)
    toks_per_doc = [s.lower().split() for s in t["text"].to_pylist()]
    lens = np.array([len(x) for x in toks_per_doc], dtype=np.int64)
    flat = [w for ts in toks_per_doc for w in ts]
    codes, uniques = pd.factorize(np.asarray(flat, dtype=object))
    th = _md5_token_hashes(uniques)[codes] if len(flat) else np.empty(0, np.uint64)
    ub = (_mix64(th * _POS_MULT[0]) % np.uint64(n_feat)).astype(np.int64)
    doc_idx = np.repeat(np.arange(len(lens), dtype=np.int64), lens)
    n_starts = len(th) - 1
    if n_starts > 0:
        offs = np.concatenate([np.zeros(1, np.int64), np.cumsum(lens)])[:-1]
        s = np.arange(len(th), dtype=np.int64) - offs[doc_idx]
        valid = (s <= np.repeat(lens, lens) - 2)[:n_starts]
        bb = (_mix64(th[:-1] * _POS_MULT[0] ^ th[1:] * _POS_MULT[1])
              % np.uint64(n_feat)).astype(np.int64)[valid]
        bdoc = doc_idx[:n_starts][valid]
    else:
        bb = np.empty(0, np.int64)
        bdoc = np.empty(0, np.int64)

    occ_doc = np.concatenate([doc_idx, bdoc])
    occ_b = np.concatenate([ub, bb])
    ng = lens + np.maximum(lens - 1, 0)

    # dense stats from the SAME gopher kernel outputs the label uses
    nw = gf["n_words"].to_numpy()
    nc = gf["n_word_chars"].to_numpy()
    na = gf["n_alpha_words"].to_numpy()
    nh = gf["n_hash"].to_numpy()
    ne = gf["n_ellipsis"].to_numpy()
    ns = gf["n_stop_distinct"].to_numpy()
    nw1 = np.maximum(nw, 1)
    dv = np.round(np.stack([
        np.log1p(nw) / 12.0,
        nc / (nw1 * 10.0),
        np.minimum(10.0 * (nh + ne) / nw1, 1.0),
        na / nw1,
        np.minimum(ns / 4.0, 1.0),
    ], axis=1) * 1e6).astype(np.int64)
    cnw = np.minimum(nw, _NW_CAP - 1)

    # per-doc (bucket -> count), sorted by (doc, bucket): one lexsort + one
    # run-length pass — no Python per-doc loop.
    fb_off = np.zeros(len(lens) + 1, dtype=np.int64)
    if len(occ_doc):
        order = np.lexsort((occ_b, occ_doc))
        od, ob = occ_doc[order], occ_b[order]
        new = np.empty(len(od), dtype=bool)
        new[0] = True
        new[1:] = (od[1:] != od[:-1]) | (ob[1:] != ob[:-1])
        starts = np.flatnonzero(new)
        cnts = np.diff(np.append(starts, len(od)))
        gb, gd = ob[starts], od[starts]
        np.add.at(fb_off[1:], gd, 1)
        np.cumsum(fb_off, out=fb_off)
    else:
        gb = cnts = np.empty(0, np.int64)
    fb = pa.ListArray.from_arrays(pa.array(fb_off, pa.int32()),
                                  pa.array(gb, pa.int64()))
    fc = pa.ListArray.from_arrays(pa.array(fb_off, pa.int32()),
                                  pa.array(cnts.astype(np.int64), pa.int64()))
    dv_off = pa.array(np.arange(0, (len(lens) + 1) * _N_DENSE, _N_DENSE,
                                dtype=np.int64), pa.int32())
    return pa.table({
        "doc_id": t["doc_id"],
        "label": gf["passes_gopher"],
        "ng": pa.array(ng, pa.int64()),
        "cnw": pa.array(cnw, pa.int64()),
        "dv": pa.ListArray.from_arrays(dv_off,
                                       pa.array(dv.reshape(-1), pa.int64())),
        "fb": fb,
        "fc": fc,
    })


def _flat_features(t: pa.Table):
    """Flatten one feature-table batch: (y, ng, cnw, dv[n,5], doc_of_occ,
    b_occ, c_occ) — shared by the gradient and score passes."""
    y = t["label"].to_numpy(zero_copy_only=False).astype(np.int64)
    ng = t["ng"].to_numpy(zero_copy_only=False)
    cnw = t["cnw"].to_numpy(zero_copy_only=False)
    dv = pc.list_flatten(t["dv"]).to_numpy(zero_copy_only=False).reshape(
        t.num_rows, _N_DENSE)
    fb = t["fb"]
    counts = pc.list_value_length(fb).to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(np.arange(t.num_rows, dtype=np.int64), counts)
    b = pc.list_flatten(fb).to_numpy(zero_copy_only=False)
    c = pc.list_flatten(t["fc"]).to_numpy(zero_copy_only=False)
    return y, ng, cnw, dv, doc_of, b, c


def _doc_logits_micro(w: np.ndarray, n_feat: int, ng, cnw, dv, doc_of, b, c,
                      n_docs: int) -> np.ndarray:
    """Integer micro-logits per doc:
    round(K * S_d / ng_d) + w_cnw[slot_d] + w_bias
      + sum_k round(w_dense_k * dv_dk / 1e6),
    where S_d = sum_j w[j] * c_dj is an EXACT int64 sum (order-free) and
    every rounding is doc-local — the logit is a pure per-doc function of
    (w, features), independent of batching."""
    S = np.zeros(n_docs, dtype=np.int64)
    np.add.at(S, doc_of, w[b] * c)
    bias_at = n_feat + _NW_CAP
    return (
        np.round(_GRAM_SCALE * S / np.maximum(ng, 1)).astype(np.int64)
        + w[n_feat + cnw]
        + w[bias_at]
        + np.round(w[bias_at + 1:][None, :] * (dv / 1e6)).astype(np.int64).sum(axis=1)
    )


def _grad_partial_arrays(t: pa.Table, w_now: np.ndarray, n_feat: int):
    """One block's gradient partial: (G int64[W], loss_micro, n_correct,
    n_docs).  Every per-(doc, feature) contribution is rounded to int64
    micros BEFORE any sum; the add.at-of-integer-valued-float64 sums stay
    exact (<2^53), so the partial is a pure function of (block, w) —
    independent of which execution path (map_batches or raw task) ran it."""
    W = _n_weights(n_feat)
    bias_at = n_feat + _NW_CAP
    y, ng, cnw, dv, doc_of, b, c = _flat_features(t)
    n = t.num_rows
    zm = _doc_logits_micro(w_now, n_feat, ng, cnw, dv, doc_of, b, c, n)
    z = np.clip(zm / 1e6, -30.0, 30.0)
    p = 1.0 / (1.0 + np.exp(-z))
    err = p - y  # in (-1, 1)
    err_micro = np.round(err * 1e6)
    g = np.zeros(W, dtype=np.float64)
    np.add.at(g, b, np.round(
        _GRAM_SCALE * err[doc_of] * c / np.maximum(ng, 1)[doc_of] * 1e6))
    np.add.at(g, n_feat + cnw, err_micro)
    g[bias_at] = err_micro.sum()
    g[bias_at + 1:] = np.round(err[:, None] * (dv / 1e6) * 1e6).sum(axis=0)
    # per-doc CE loss, micros (logaddexp: stable in both tails)
    loss = np.round(np.logaddexp(0.0, np.where(y == 1, -z, z)) * 1e6)
    correct = int(((zm >= 0).astype(np.int64) == y).sum())
    return g.astype(np.int64), int(loss.sum()), correct, n


def _train(feats, n_feat: int, iters: int, lr: float):
    """Full-batch AdaGrad over the materialized feature Dataset; returns
    (w_micro int64[W], metrics DataFrame one row per iteration).

    The iteration loop is a RAW-TASK all-reduce over the Dataset's pinned
    Arrow block refs — the one shape here where per-iteration Dataset
    execution is the wrong tool: each ``map_batches`` pass pays
    plan+schedule setup (~0.3 s measured) for work that is milliseconds,
    and at 40 iterations that overhead dominated the query (16.5 s at
    sf0.1).  The task loop reuses the same object-store blocks across
    iterations with only an ~10 KB weight ref broadcast per round.
    Partials are integer, so the reduce is order-free and bit-identical to
    the map_batches formulation (the pytest sequential-reference and
    partition-invariance locks cover this path)."""
    import ray as _ray

    W = _n_weights(n_feat)
    refs = feats.to_arrow_refs()

    @_ray.remote
    def block_grad(block, w_now, nf):
        return _grad_partial_arrays(block, w_now, nf)

    w = np.zeros(W, dtype=np.int64)
    g2 = np.zeros(W, dtype=np.float64)  # driver-only AdaGrad state
    history = []
    for it in range(iters):
        w_ref = _ray.put(w.copy())  # broadcast once per iteration
        parts = _ray.get([block_grad.remote(r, w_ref, n_feat) for r in refs])
        G = np.zeros(W, dtype=np.int64)
        loss = correct = n_docs = 0
        for gb, lb, cb, nb in parts:  # integer sums: order-free
            G += gb
            loss += lb
            correct += cb
            n_docs += nb
        # AdaGrad: mean gradient in natural units; accumulator and step are a
        # single-threaded driver function of the exact integer sums.
        gm = G / max(n_docs, 1) / 1e6
        g2 += gm * gm
        w = w - np.round(lr * gm / np.sqrt(1e-8 + g2) * 1e6).astype(np.int64)
        history.append({"iteration": it, "loss_micro": loss,
                        "n_correct": correct, "n_docs": n_docs})
    return w, pd.DataFrame(history)


_CLF_CACHE: dict = {}


def _trained(sf_dir: str, n_feat: int, iters: int, lr: float):
    """Session cache of (feature Dataset, weights, metrics) — the score and
    metrics queries share one training run (the _minhash_labels_ds idiom).
    Keyed on the documents file identity + hyperparameters."""
    p = os.path.join(sf_dir, "documents.parquet")
    st = os.stat(p)
    key = (os.path.abspath(p), st.st_mtime_ns, st.st_size, n_feat, iters, lr)
    if key not in _CLF_CACHE:
        feats = (
            _docs(sf_dir, ["doc_id", "text"])
            .map_batches(lambda t: _doc_feature_batch(t, n_feat),
                         batch_format="pyarrow")
            .materialize()
        )
        w, metrics = _train(feats, n_feat, iters, lr)
        _CLF_CACHE[key] = (feats, w, metrics)
    return _CLF_CACHE[key]


def quality_classifier_score_ds(sf_dir: str, n_feat: int = 1024,
                                iters: int = 40, lr: float = 4.0):
    """Dataset of (doc_id, label_gopher, logit_micro, pred_quality): train
    the wide-model logistic regression on the Gopher labels, then score
    every document in one broadcast map over the cached feature table."""
    feats, w, _ = _trained(sf_dir, n_feat, iters, lr)

    def score(t: pa.Table) -> pa.Table:
        y, ng, cnw, dv, doc_of, b, c = _flat_features(t)
        zm = _doc_logits_micro(w, n_feat, ng, cnw, dv, doc_of, b, c, t.num_rows)
        return pa.table({
            "doc_id": t["doc_id"],
            "label_gopher": t["label"],
            "logit_micro": pa.array(zm, pa.int64()),
            "pred_quality": pa.array(zm >= 0, pa.bool_()),
        })

    return feats.map_batches(score, batch_format="pyarrow")


def quality_classifier_score(sf_dir: str, n_feat: int = 1024,
                             iters: int = 40, lr: float = 4.0) -> pd.DataFrame:
    """Driver-protocol wrapper of :func:`quality_classifier_score_ds` —
    same columns, collected and doc_id-sorted."""
    out = quality_classifier_score_ds(sf_dir, n_feat, iters, lr).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


def quality_classifier_metrics(sf_dir: str, n_feat: int = 1024,
                               iters: int = 40, lr: float = 4.0) -> pd.DataFrame:
    """(iteration, loss_micro, n_correct, n_docs) — one row per AdaGrad
    iteration, every value an exact integer: the training curve as a
    driver-checkable artifact (it must be bit-identical across runs and
    parallelism levels, which is the whole point of the integer-micro
    gradient discipline)."""
    _, _, metrics = _trained(sf_dir, n_feat, iters, lr)
    return metrics.copy()


def quality_classifier_pr_curve(sf_dir: str, n_points: int = 21,
                                n_feat: int = 1024, iters: int = 40,
                                lr: float = 4.0) -> pd.DataFrame:
    """(threshold_micro, tp, fp, fn, tn, precision_milli, recall_milli) —
    the precision/recall trade-off curve of the trained quality classifier
    at ``n_points`` integer logit thresholds spanning the corpus's own
    [min, max] logit range: the artifact a curation team reads to PICK the
    operating point (metrics' accuracy is one point on this curve).

    Every value is an exact integer: thresholds are an integer linspace
    over the exact micro logits (``lo + i*(hi-lo)//(n_points-1)``), counts
    are int64 sums, and the ratios are integer milli floor-divisions — the
    whole frame is bit-identical across runs and parallelism levels.
    Rows-only (the model is iterative); pytest locks count conservation,
    recall monotonicity, and the endpoint rows.

    Scale shape: two map-only passes over the scored Dataset — pass 1
    streams (min, max) logit partials, pass 2 streams n_points x 4 count
    partials per block (thresholds broadcast in the closure); the driver
    reduce is n_points rows.  No shuffle anywhere.
    """
    scores = quality_classifier_score_ds(sf_dir, n_feat, iters, lr)
    scores = scores.materialize()  # consumed twice: range + counts

    def rng(t: pa.Table) -> pa.Table:
        z = t["logit_micro"].to_numpy()
        return pa.table({"lo": pa.array([int(z.min())], pa.int64()),
                         "hi": pa.array([int(z.max())], pa.int64())})

    m = scores.map_batches(rng, batch_format="pyarrow").to_pandas()
    lo, hi = int(m["lo"].min()), int(m["hi"].max())
    ths = np.array([lo + i * (hi - lo) // (n_points - 1)
                    for i in range(n_points)], dtype=np.int64)

    def counts(t: pa.Table) -> pa.Table:
        z = t["logit_micro"].to_numpy()
        y = t["label_gopher"].to_numpy()
        pred = z[None, :] >= ths[:, None]          # (n_points, batch)
        tp = (pred & y[None, :]).sum(axis=1)
        fp = (pred & ~y[None, :]).sum(axis=1)
        fn = (~pred & y[None, :]).sum(axis=1)
        tn = (~pred & ~y[None, :]).sum(axis=1)
        return pa.table({"i": pa.array(np.arange(n_points), pa.int64()),
                         "tp": pa.array(tp.astype(np.int64), pa.int64()),
                         "fp": pa.array(fp.astype(np.int64), pa.int64()),
                         "fn": pa.array(fn.astype(np.int64), pa.int64()),
                         "tn": pa.array(tn.astype(np.int64), pa.int64())})

    parts = scores.map_batches(counts, batch_format="pyarrow").to_pandas()
    agg = parts.groupby("i", as_index=False)[["tp", "fp", "fn", "tn"]].sum()
    agg = agg.sort_values("i").reset_index(drop=True)
    tp, fp, fn = (agg[c].to_numpy() for c in ("tp", "fp", "fn"))
    out = pd.DataFrame({
        "threshold_micro": ths,
        "tp": tp, "fp": fp, "fn": fn, "tn": agg["tn"].to_numpy(),
        "precision_milli": 1000 * tp // np.maximum(tp + fp, 1),
        "recall_milli": 1000 * tp // np.maximum(tp + fn, 1),
    })
    return out.astype({c: "int64" for c in out.columns})


def hash_feature_regression(sf_dir: str, n_dims: int = 16) -> pd.DataFrame:
    """(name, value) — CLOSED-FORM distributed linear regression: least
    squares of per-doc whitespace token count on the signed feature-hash
    vectors (text.feature_hash_batch) plus an intercept, solved from the
    normal equations.  The one-pass all-reduce ML shape next to
    quality_classifier's iterative AdaGrad: X^T X and X^T y are EXACT
    integer sums of per-doc outer products, so the whole reduction is
    order-free and partition-invariant; the (d+1)x(d+1) solve runs
    single-threaded on the driver (lstsq — pseudo-inverse, so collinear
    hash dims are fine), the quality_classifier platform-stability stance.

    Output rows: coef_f00..coef_f{n-1} and intercept in int64 micros,
    r2_milli (from the exact scalar sums: SSE = yy - 2 w.b + w.A w), and
    n_docs.  Rows-only (a matrix solve is not SQL); pytest locks a
    sequential numpy reference, a planted exactly-linear corpus (r2 =
    1000), and determinism.

    Scale shape: ONE map-only pass; each block emits a constant
    (d+1)(d+2)/2 + d+4 integer partial row set; no shuffle anywhere.
    """
    from .io import read_pruned
    from .text import feature_hash_batch

    d1 = n_dims + 1  # + intercept
    iu, ju = np.triu_indices(d1)

    ds = read_pruned(os.path.join(sf_dir, "documents.parquet"),
                     ["doc_id", "text"])

    def partial(t: pa.Table) -> pa.Table:
        _ids, X, y = feature_hash_batch(t, n_dims)
        xa = np.concatenate([X, np.ones((len(y), 1), np.int64)], axis=1)
        A = xa.T @ xa                     # exact int64
        b = xa.T @ y
        return pa.table({
            "i": pa.array(np.concatenate([iu, np.arange(d1), [-2, -2]]),
                          pa.int64()),
            "j": pa.array(np.concatenate([ju, np.full(d1, -1), [0, 1]]),
                          pa.int64()),
            "v": pa.array(np.concatenate(
                [A[iu, ju], b, [len(y), int(y @ y)]]), pa.int64()),
        })

    red = (ds.map_batches(partial, batch_format="pyarrow").to_pandas()
           .groupby(["i", "j"], as_index=False)["v"].sum())
    A = np.zeros((d1, d1), np.float64)
    sec = red[(red["i"] >= 0) & (red["j"] >= 0)]
    A[sec["i"].to_numpy(), sec["j"].to_numpy()] = sec["v"].to_numpy()
    A = np.where(A == 0, A.T, A)
    bred = red[red["j"] == -1].sort_values("i")
    b = bred["v"].to_numpy().astype(np.float64)
    sc = red[red["i"] == -2].sort_values("j")["v"].to_numpy()
    n, yy = int(sc[0]), int(sc[1])

    w, *_ = np.linalg.lstsq(A, b, rcond=None)
    sse = float(yy) - 2.0 * float(w @ b) + float(w @ A @ w)
    ybar2 = (float(b[-1]) / n) ** 2 if n else 0.0  # b[-1] = sum(y)
    sst = float(yy) - n * ybar2
    r2_milli = int(round(1000.0 * (1.0 - sse / sst))) if sst > 0 else 1000

    names = [f"coef_f{j:02d}" for j in range(n_dims)] + ["intercept"]
    vals = [int(round(c * 1e6)) for c in w]
    return pd.DataFrame({
        "name": names + ["r2_milli", "n_docs"],
        "value": np.array(vals + [r2_milli, n], dtype=np.int64),
    })
