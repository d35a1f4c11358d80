"""PRNG streams, metrics logger, throughput meter."""

import json

import numpy as np

from guitar_tablature_classification_tpu.utils import (
    KeySequence,
    MetricsLogger,
    ThroughputMeter,
    set_seed,
)


def test_key_sequence_deterministic_and_distinct():
    ks1, ks2 = KeySequence(7), KeySequence(7)
    a1, a2 = ks1("dropout"), ks1("dropout")
    b1 = ks1("shuffle")
    assert not np.array_equal(np.asarray(a1), np.asarray(a2))
    assert not np.array_equal(np.asarray(a1), np.asarray(b1))
    # same seed+stream reproduces the sequence
    assert np.array_equal(np.asarray(a1), np.asarray(ks2("dropout")))


def test_set_seed_returns_key():
    key = set_seed(3)
    assert np.asarray(key).shape in ((2,), ())


def test_metrics_logger_jsonl(tmp_path, capsys):
    path = tmp_path / "log.jsonl"
    logger = MetricsLogger(str(path))
    logger.log("epoch", loss=1.5, acc=np.float32(0.25),
               per_string=np.array([1.0, 2.0]))
    logger.close()
    rec = json.loads(path.read_text().strip())
    assert rec["event"] == "epoch"
    assert rec["loss"] == 1.5
    assert rec["per_string"] == [1.0, 2.0]


def test_throughput_meter():
    import jax.numpy as jnp

    meter = ThroughputMeter()
    meter.start()
    meter.count(100)
    rate = meter.stop(barrier=jnp.ones((4,)))
    assert rate > 0
