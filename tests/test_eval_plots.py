import numpy as np
import pandas as pd

from gctplus_tpu.eval.plots import (
    plot_conditional_property,
    plot_property_distributions,
)


def test_property_distribution_plot(tmp_path):
    rng = np.random.default_rng(0)
    gen = pd.DataFrame({"logP": rng.normal(2, 1, 200),
                        "tPSA": rng.normal(60, 20, 200),
                        "HBD": rng.integers(0, 4, 200)})
    ref = pd.DataFrame({"logP": rng.normal(2.5, 1, 200),
                        "tPSA": rng.normal(55, 18, 200),
                        "HBD": rng.integers(0, 4, 200)})
    out = plot_property_distributions(gen, ref, str(tmp_path))
    assert out is None or out.endswith(".png")


def test_conditional_property_plot(tmp_path):
    rng = np.random.default_rng(1)
    vals = {1.0: rng.normal(1, 0.3, 100), 3.0: rng.normal(3, 0.3, 100)}
    out = plot_conditional_property(vals, "logP", str(tmp_path))
    assert out is None or out.endswith(".png")
