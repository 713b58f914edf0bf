"""Regression tests for the REAL-data application loaders.

The reference ships its application datasets in this image
(/root/reference/examples/*/data); these tests pin the data-prep
semantics of the runnable applications (examples/*_real.py) — the
sample/outcome counts the round artifacts were produced from — so a
prep regression can't silently change what the applications fit.

Pure pandas/numpy: no JAX, no fitting.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference/examples"
EXAMPLES = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "examples")
sys.path.insert(0, EXAMPLES)

needs_ref = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference datasets not available")


@needs_ref
def test_ihmp_prep_shapes_and_semantics():
    from ihmp_real import COVARIATES, load_ihmp

    X, Y, lookup = load_ihmp()
    # the counts the committed artifacts were produced from
    assert X.shape == (394, 9)
    assert Y.shape == (394, 596)
    assert list(X.columns) == COVARIATES
    assert X.index.equals(Y.index)
    assert X["participant_id"].nunique() == 78
    # covariate-complete rows only (ihmp_waveome_hpc_run.py:128-145)
    assert not X.isna().any().any()
    # missing intensities imputed to 0, never NaN (:20-34)
    assert not Y.isna().any().any()
    assert (Y.values >= 0).all()
    # derived-column semantics: age = consent_age + study_days/365,
    # active_disease is the "0"/"1" string np.where encoding
    assert set(X["active_disease"].unique()) <= {"0", "1"}
    assert lookup.shape[1] == 3


@needs_ref
def test_cd4_prep_shapes():
    from cd4_real import load_cd4

    X, Y = load_cd4()
    # complete-case bivariate frame fitted by the committed artifacts
    assert X.shape == (366, 3)
    assert list(X.columns) == ["index", "time", "trt"]
    assert list(Y.columns) == ["SPRNA", "BPRNA"]
    assert np.isfinite(X.values).all() and np.isfinite(Y.values).all()


@needs_ref
def test_hot_prep_shapes():
    from hot_real import COVARIATES, load_hot

    X, Y = load_hot()
    assert X.shape == (42, len(COVARIATES))
    # >=20-nonzero-sample taxon filter keeps 4,516 of the raw taxa
    assert Y.shape == (42, 4516)
    assert (Y.values >= 0).all()


@needs_ref
def test_breastmilk_prep_filter_count():
    from breastmilk_real import COVARIATES, load_breastmilk

    X, Y = load_breastmilk()
    assert list(X.columns) == COVARIATES
    # notebook cell 8's reported selection count: 1020 metabolites with
    # >=2 nonzero samples in each of >=5 infants
    assert Y.shape[1] == 1020
    assert len(X) == len(Y)
