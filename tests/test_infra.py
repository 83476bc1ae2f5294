"""Infrastructure odds and ends: logger, prefetch error propagation,
profiling timer, common helpers."""

import json
import os

import numpy as np
import pytest

from biomedkg_tpu.common import (clean_name, format_time, generator,
                                 parameters_count, round_up)
from biomedkg_tpu.sampling.loaders import prefetch
from biomedkg_tpu.training.logger import MetricsLogger
from biomedkg_tpu.utils.profiling import StepTimer


def test_metrics_logger(tmp_path):
    lg = MetricsLogger(save_dir=str(tmp_path), experiment_name="t")
    lg.log({"loss": 1.5, "auroc": 0.7}, step=1)
    lg.log({"loss": 1.2, "auroc": 0.8}, step=2)
    lg.close()
    lines = open(tmp_path / "metrics.jsonl").read().strip().splitlines()
    assert len(lines) == 2
    rec = json.loads(lines[1])
    assert rec["loss"] == 1.2 and rec["step"] == 2
    assert os.path.exists(tmp_path / "metrics.csv")


def test_prefetch_propagates_errors():
    def gen():
        yield 1
        raise RuntimeError("worker failed")

    it = prefetch(gen())
    assert next(it) == 1
    with pytest.raises(RuntimeError, match="worker failed"):
        list(it)


def test_prefetch_order():
    assert list(prefetch(iter(range(20)))) == list(range(20))


def test_step_timer():
    t = StepTimer()
    t.start()
    t.stop(items=10)
    rates = t.rates()
    assert rates["items_per_sec"] > 0
    assert rates["steps_per_sec"] > 0


def test_common_helpers():
    assert clean_name("gene/protein") == "geneprotein"
    assert clean_name("off-label use") == "offlabeluse"
    assert format_time(3723) == "01:02:03"
    assert round_up(130, 128) == 256
    assert list(generator([1, 2, 3, 4, 5], 2)) == [[1, 2], [3, 4], [5]]
    params = {"a": np.zeros((2, 3)), "b": [np.ones(4)]}
    assert parameters_count(params) == 10
