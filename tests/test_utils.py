"""Utilities: run logging, metrics stream, profiling helpers."""

import json
import logging
import os

import jax.numpy as jnp
import numpy as np
import pytest

from qfa_tpu.config import load_config
from qfa_tpu.utils import (
    MetricsWriter,
    make_logger,
    setup_run_dir,
    timed,
    tree_health,
)


def test_setup_run_dir_dumps_config(tmp_path):
    cfg = load_config(opts=["MODEL.NH", "5"])
    out = setup_run_dir(str(tmp_path / "run"), cfg)
    text = open(os.path.join(out, "config.yaml")).read()
    assert "NH: 5" in text


def test_logger_writes_reference_format(tmp_path):
    out = setup_run_dir(str(tmp_path / "run2"))
    logger = make_logger(out, name="qfa_test_logger")
    logger.info("epoch: 000/005  ;  loss:  1.23  ;  time:  0.10 s")
    for h in logger.handlers:
        h.flush()
    text = open(os.path.join(out, "log.txt")).read()
    assert "loss:  1.23" in text
    assert "INFO" in text


def test_metrics_writer_jsonl(tmp_path):
    with MetricsWriter(str(tmp_path)) as m:
        m.write(epoch=0, loss=3.14)
        m.write(epoch=1, loss=2.71, extra="x")
    rows = [json.loads(l) for l in open(m.path)]
    assert rows[0]["epoch"] == 0 and rows[0]["loss"] == 3.14
    assert rows[1]["extra"] == "x"
    assert all("wall_s" in r for r in rows)


def test_timed_records_seconds():
    sink_calls = []
    with timed("block", sink=sink_calls.append) as rec:
        _ = sum(range(1000))
    assert rec["seconds"] > 0
    assert sink_calls and "block" in sink_calls[0]


def test_tree_health_flags_nonfinite():
    tree = {"good": jnp.ones((3,)), "bad": jnp.array([1.0, np.nan])}
    health = tree_health(tree)
    by_name = {k: v for k, v in health.items()}
    good = next(v for k, v in by_name.items() if "good" in k)
    bad = next(v for k, v in by_name.items() if "bad" in k)
    assert good["finite"] is True
    assert bad["finite"] is False
    assert good["shape"] == [3]
