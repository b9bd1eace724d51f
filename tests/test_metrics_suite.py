"""moses metric-suite completeness (VERDICT r4 item 4): Filters,
TestSF split columns, and the logP/SA/QED/weight Wasserstein-1
distances of moses.get_all_metrics
(reference Inference/uc_sampling.py:26-39)."""

import numpy as np
import pytest

from gctplus_tpu.chem.filters import (
    fraction_passes_filters,
    mol_passes_filters,
)
from gctplus_tpu.eval.metrics import get_all_metrics, wasserstein_w1


class TestMolPassesFilters:
    def test_druglike_passes(self):
        assert mol_passes_filters("CC(=O)Nc1ccc(O)cc1")  # paracetamol
        assert mol_passes_filters("c1ccccc1CN1CCOCC1")

    def test_charged_fails(self):
        assert not mol_passes_filters("C[N+](C)(C)C")

    def test_disallowed_atom_fails(self):
        assert not mol_passes_filters("CCI")  # iodine not in allowed set

    def test_macrocycle_fails(self):
        assert not mol_passes_filters("C1CCCCCCCCC1")  # 10-ring

    def test_seven_ring_passes(self):
        assert mol_passes_filters("C1CCCCCC1")

    def test_mcf_alerts_fail(self):
        assert not mol_passes_filters("CC1CO1")        # epoxide
        assert not mol_passes_filters("CC(=O)Cl")      # acyl halide
        assert not mol_passes_filters("CCN=C=O")       # isocyanate
        assert not mol_passes_filters("CCCCCCCCCCCC")  # long chain
        assert not mol_passes_filters("CCS")           # thiol (Brenk)

    def test_invalid_smiles_fails(self):
        assert not mol_passes_filters("not-a-smiles")

    def test_fraction_over_valid_subset(self):
        # invalid rows are excluded from the denominator (moses
        # computes Filters over the canonical valid subset)
        assert fraction_passes_filters(
            ["CC(=O)Nc1ccc(O)cc1", "CCI", "xx"], 1) == 0.5


class TestWasserstein:
    def test_known_value(self):
        assert wasserstein_w1([1, 2], [1, 3]) == pytest.approx(0.5)

    def test_identical_is_zero(self):
        vals = [0.1, 0.4, 2.2]
        assert wasserstein_w1(vals, vals) == pytest.approx(0.0)

    def test_shift_equals_delta(self):
        a = np.linspace(0, 1, 50)
        assert wasserstein_w1(a, a + 0.3) == pytest.approx(0.3)

    def test_nan_filtered(self):
        assert wasserstein_w1([1.0, np.nan], [1.0]) == pytest.approx(0.0)


def test_get_all_metrics_column_set():
    """uc metric report carries the moses.get_all_metrics column set
    (FCD columns artifact-gated; FDD is the always-on stand-in)."""
    gen = ["CC(=O)Nc1ccc(O)cc1", "c1ccccc1CN1CCOCC1", "CCO", "bad", "CCN",
           "CCOC", "CCNC"]
    m = get_all_metrics(gen, train=["CCO"],
                        test=["CCO", "CCN", "c1ccccc1", "CCOC"],
                        test_scaffolds=["c1ccncc1CC", "c1ccncc1"],
                        k=(2,))
    expected = {
        "valid", "unique@2", "unique", "IntDiv", "IntDiv2", "Filters",
        "novelty",
        "SNN/Test", "Frag/Test", "Scaf/Test", "FDD/Test",
        "SNN/TestSF", "Frag/TestSF", "Scaf/TestSF", "FDD/TestSF",
        "logP", "SA", "QED", "weight",
    }
    missing = expected - set(m)
    assert not missing, f"missing columns: {missing}"
    assert 0.0 <= m["Filters"] <= 1.0
    assert m["valid"] == pytest.approx(6 / 7)
    assert np.isfinite(m["logP"]) and np.isfinite(m["weight"])


def test_molgpt_target_grid():
    """molgpt grid is the 2x2x2 cartesian product of
    config_default.py:15-20 over logP/tPSA/SAS."""
    from gctplus_tpu.config import (
        MOLGPT_TARGET_PROPS,
        target_prop_combinations,
    )
    combos = target_prop_combinations(("logP", "tPSA", "SAS"),
                                      scaffold_source="molgpt")
    assert len(combos) == 8
    assert combos[0] == (1.0, 40.0, 2.0)
    assert set(MOLGPT_TARGET_PROPS) == {"logP", "tPSA", "SAS"}
    # default grid unchanged
    assert len(target_prop_combinations()) == 27
