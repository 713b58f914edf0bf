"""Native host runtime tests: build, CSV parsing, async sink, counters."""

import os

import numpy as np
import pytest

from waveome_tpu import runtime


def test_native_builds():
    assert runtime.native_available(), "native library failed to build"


def test_csv_read_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    arr = rng.normal(size=(500, 7))
    path = tmp_path / "data.csv"
    header = ",".join(f"c{i}" for i in range(7))
    np.savetxt(path, arr, delimiter=",", header=header, comments="")
    data, names = runtime.read_csv(str(path))
    assert names == [f"c{i}" for i in range(7)]
    np.testing.assert_allclose(data, arr, rtol=1e-6)


def test_csv_read_no_header_and_nan(tmp_path):
    path = tmp_path / "x.csv"
    path.write_text("1.0,2.0\n3.0,oops\n")
    data, names = runtime.read_csv(str(path), has_header=False)
    assert names is None
    assert data.shape == (2, 2)
    assert np.isnan(data[1, 1])
    np.testing.assert_allclose(data[0], [1.0, 2.0])


def test_async_sink_roundtrip(tmp_path):
    sink = runtime.AsyncResultSink(str(tmp_path / "sink"))
    for i in range(20):
        sink.put(f"outcome/{i}", {"a": np.full((3,), float(i)),
                                  "mask": np.array([1.0, 0.0])})
    sink.flush()
    assert sink.written == 20
    loaded = runtime.AsyncResultSink.load(str(tmp_path / "sink"),
                                          "outcome/7")
    np.testing.assert_allclose(loaded["a"], [7.0, 7.0, 7.0])
    # manifest written
    manifest = (tmp_path / "sink" / "manifest.log").read_text()
    assert len(manifest.strip().splitlines()) == 20
    sink.close()


def test_progress_counter():
    c = runtime.ProgressCounter(total=10)
    for _ in range(7):
        c.add()
    c.add(3)
    assert c.value == 10
    c.close()
