"""quality_classifier — exactness vs a sequential reference, partition
invariance, and learning-quality floors.

The op is rows-only in the driver protocol (iterative training is not
SQL-expressible); these tests are its correctness lock, the
bpe_train_merges precedent.
"""
import numpy as np
import pandas as pd
import pyarrow.parquet as pq
import ray

from engine.ops import ml

SF = "/root/testdata/sf0.001"
N_FEAT = 256
ITERS = 12
LR = 4.0


def _single_batch_feats():
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    return ml._doc_feature_batch(t, N_FEAT)


def _ref_logits(w, y, ng, cnw, dv, doc_of, b, c, n):
    S = np.zeros(n, np.int64)
    np.add.at(S, doc_of, w[b] * c)
    bias_at = N_FEAT + ml._NW_CAP
    return (np.round(ml._GRAM_SCALE * S / np.maximum(ng, 1)).astype(np.int64)
            + w[N_FEAT + cnw] + w[bias_at]
            + np.round(w[bias_at + 1:][None, :] * (dv / 1e6)
                       ).astype(np.int64).sum(axis=1))


def _sequential_reference(ft):
    """Plain-numpy AdaGrad over the single-batch feature table — written
    independently of engine.ops.ml._train (no Ray, no partial tables)."""
    y, ng, cnw, dv, doc_of, b, c = ml._flat_features(ft)
    n = ft.num_rows
    W = ml._n_weights(N_FEAT)
    bias_at = N_FEAT + ml._NW_CAP
    w = np.zeros(W, np.int64)
    g2 = np.zeros(W, np.float64)
    hist = []
    for it in range(ITERS):
        zm = _ref_logits(w, y, ng, cnw, dv, doc_of, b, c, n)
        z = np.clip(zm / 1e6, -30.0, 30.0)
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g = np.zeros(W, np.float64)
        np.add.at(g, b, np.round(
            ml._GRAM_SCALE * err[doc_of] * c / np.maximum(ng, 1)[doc_of] * 1e6))
        np.add.at(g, N_FEAT + cnw, np.round(err * 1e6))
        g[bias_at] = np.round(err * 1e6).sum()
        g[bias_at + 1:] = np.round(err[:, None] * (dv / 1e6) * 1e6).sum(axis=0)
        loss = int(np.round(
            np.logaddexp(0.0, np.where(y == 1, -z, z)) * 1e6).sum())
        hist.append((it, loss, int(((zm >= 0).astype(np.int64) == y).sum()), n))
        gm = g.astype(np.int64) / n / 1e6
        g2 += gm * gm
        w = w - np.round(LR * gm / np.sqrt(1e-8 + g2) * 1e6).astype(np.int64)
    zm = _ref_logits(w, y, ng, cnw, dv, doc_of, b, c, n)
    return w, hist, zm


def test_quality_classifier_matches_sequential():
    ft = _single_batch_feats()
    w_ref, hist_ref, zm_ref = _sequential_reference(ft)

    feats = ray.data.from_arrow(ft).repartition(5).materialize()
    w_eng, metrics = ml._train(feats, N_FEAT, ITERS, LR)
    assert np.array_equal(w_eng, w_ref)
    assert [tuple(r) for r in metrics.itertuples(index=False)] == hist_ref

    # and the public score path agrees doc-for-doc with the reference logits
    out = ml.quality_classifier_score(SF, n_feat=N_FEAT, iters=ITERS, lr=LR)
    ref = pd.DataFrame({
        "doc_id": ft["doc_id"].to_numpy(),
        "logit_micro": zm_ref,
    }).sort_values("doc_id").reset_index(drop=True)
    assert np.array_equal(out["logit_micro"].to_numpy(),
                          ref["logit_micro"].to_numpy())
    assert np.array_equal(out["pred_quality"].to_numpy(),
                          out["logit_micro"].to_numpy() >= 0)


def test_quality_classifier_partition_invariance():
    ft = _single_batch_feats()
    base = ray.data.from_arrow(ft)
    w1, m1 = ml._train(base.repartition(1).materialize(), N_FEAT, ITERS, LR)
    w7, m7 = ml._train(base.repartition(7).materialize(), N_FEAT, ITERS, LR)
    assert np.array_equal(w1, w7)
    pd.testing.assert_frame_equal(m1, m7)


def test_quality_classifier_learns_the_gate():
    m = ml.quality_classifier_metrics(SF)
    assert m.loss_micro.iloc[-1] < m.loss_micro.iloc[0]
    acc = m.n_correct.iloc[-1] / m.n_docs.iloc[-1]
    assert acc >= 0.98  # measured 1.0 at the default hyperparameters
    s = ml.quality_classifier_score(SF)
    assert len(s) == m.n_docs.iloc[-1]
    # both classes are actually predicted (no majority-class collapse)
    assert 0 < s.pred_quality.sum() < len(s)


def test_quality_classifier_pr_curve(ray_session):
    """Count conservation (tp+fp+fn+tn = n at every threshold, tp+fn =
    positives constant), recall monotone non-increasing in the threshold,
    endpoint rows (lowest threshold keeps everything -> recall 1000),
    determinism, and consistency with the scored frame at threshold lo."""
    out = ml.quality_classifier_pr_curve(SF, n_points=11, n_feat=N_FEAT,
                                         iters=ITERS, lr=LR)
    scores = ml.quality_classifier_score(SF, n_feat=N_FEAT, iters=ITERS, lr=LR)
    n, pos = len(scores), int(scores["label_gopher"].sum())

    assert len(out) == 11
    tot = out[["tp", "fp", "fn", "tn"]].sum(axis=1)
    assert (tot == n).all()
    assert ((out["tp"] + out["fn"]) == pos).all()
    assert (np.diff(out["recall_milli"].to_numpy()) <= 0).all()
    # lowest threshold = global min logit: every doc predicted positive
    assert out.iloc[0]["tp"] == pos and out.iloc[0]["recall_milli"] == 1000
    assert out.iloc[0]["fp"] == n - pos
    # exact tp at the lowest threshold recomputed from the scored frame
    th0 = int(out.iloc[0]["threshold_micro"])
    assert out.iloc[0]["tp"] == int(
        ((scores["logit_micro"] >= th0) & scores["label_gopher"]).sum())
    assert out.equals(ml.quality_classifier_pr_curve(
        SF, n_points=11, n_feat=N_FEAT, iters=ITERS, lr=LR))


def test_hash_feature_regression(ray_session, tmp_path):
    """Closed-form regression equals a sequential numpy reference built
    from the same exact integer normal equations; a planted exactly-linear
    corpus (single repeated token -> y proportional to its hash dim) fits
    with r2 = 1000; deterministic."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from engine.ops.text import feature_hash_batch

    out = ml.hash_feature_regression(SF)
    vals = dict(zip(out["name"], out["value"]))
    assert vals["n_docs"] == 500
    assert 0 <= vals["r2_milli"] <= 1000

    # sequential reference: same formula over the whole table at once
    t = pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    _ids, X, y = feature_hash_batch(t, 16)
    xa = np.concatenate([X, np.ones((len(y), 1), np.int64)], axis=1)
    A, b = xa.T @ xa, xa.T @ y
    w, *_ = np.linalg.lstsq(A.astype(np.float64), b.astype(np.float64),
                            rcond=None)
    for j in range(16):
        assert vals[f"coef_f{j:02d}"] == int(round(w[j] * 1e6))
    assert vals["intercept"] == int(round(w[16] * 1e6))

    # planted: docs of one repeated token — y is exactly linear in features
    d = tmp_path / "lin"
    d.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(8), pa.int64()),
        "text": pa.array([" ".join(["foo"] * (i + 1)) for i in range(8)],
                         pa.string())}), d / "documents.parquet")
    lin = ml.hash_feature_regression(str(d))
    lv = dict(zip(lin["name"], lin["value"]))
    assert lv["r2_milli"] == 1000

    assert out.equals(ml.hash_feature_regression(SF))
