"""Native chemistry kernel (native/chem.cpp) equivalence tests.

The C++ kernel must produce BYTE-IDENTICAL canonical strings / scaffold
strings / validity verdicts to the Python substrate it ports —
uniqueness, novelty and scaffold metrics depend on string identity.
Skips gracefully when no compiler is available.
"""

from __future__ import annotations

import pytest

from gctplus_tpu.native import (
    CHEM_FALLBACK,
    chem_native_available,
    native_canonical,
    native_is_valid,
    native_murcko,
)

pytestmark = pytest.mark.skipif(not chem_native_available(),
                                reason="no native chem kernel")

# hand-picked stress set: aromatics (input-kekule and aromatic forms),
# fused systems, charges, brackets, ring closures >9, scaffolding
# edge cases, invalids
CASES = [
    "CCO", "c1ccccc1", "C1=CC=CC=C1", "c1ccc2ccccc2c1",
    "C1=CC2=CC=CC=C2C=C1", "c1cc[nH]c1", "c1ccoc1", "c1ccsc1",
    "c1cnc[nH]1", "Cn1cnc2c1c(=O)n(C)c(=O)n2C",  # caffeine
    "CC(=O)Oc1ccccc1C(=O)O",                      # aspirin
    "[O-]C(=O)c1ccccc1", "[NH4+]", "[nH+]1ccccc1",
    "C[C@H](N)C(=O)O", "C[C@@H](N)C(=O)O",        # stereo dropped
    "F/C=C/F", "F/C=C\\F",
    "C%10CCCCC%10", "C1CC2CCC1CC2",               # bicyclo
    "O=C1CCCCC1", "O=S(=O)(N)c1ccccc1",
    "c1ccc(-c2ccccc2)cc1",                        # biphenyl single bond
    "C1CC1C2CC2", "CC.OC", "[13CH4]", "[2H]O[2H]",
    "N#Cc1ccccc1", "CC(C)(C)c1ccccc1",
    "c1ccc2[nH]ccc2c1", "O=c1cc[nH]c(=O)[nH]1",   # uracil
    "S1C=CC=C1",                                   # thiophene kekule
    "B1OC(C)(C)C(C)(C)O1",
    "invalid", "C1CC", "c1ccccc", "C((C))", "[Xx]", "",
    "CC(C)=CCCC(C)=CC=O",                          # acyclic scaffold ''
]


def test_native_matches_python_on_stress_cases():
    from gctplus_tpu.chem.canonical import canonical_smiles_python
    from gctplus_tpu.chem.sanitize import mol_from_smiles
    from gctplus_tpu.chem.scaffold import murcko_scaffold_python

    for s in CASES:
        nat = native_canonical(s)
        if nat is CHEM_FALLBACK:
            continue
        py = canonical_smiles_python(s)
        assert nat == py, (s, nat, py)

        natm = native_murcko(s)
        if natm is not CHEM_FALLBACK:
            pym = murcko_scaffold_python(s)
            assert natm == pym, (s, natm, pym)

        natv = native_is_valid(s)
        if natv is not CHEM_FALLBACK:
            assert natv == (mol_from_smiles(s) is not None), s


def test_native_matches_python_on_generated_corpus():
    """Round-trip over a synthetic drug-like corpus sample."""
    import random

    from gctplus_tpu.chem.canonical import canonical_smiles_python
    from gctplus_tpu.chem.scaffold import murcko_scaffold_python
    from gctplus_tpu.data.synthetic import random_druglike_smiles

    rng = random.Random(11)
    smis = [random_druglike_smiles(rng) for _ in range(150)]
    assert smis
    for s in smis:
        nat = native_canonical(s)
        if nat is CHEM_FALLBACK:
            continue
        assert nat == canonical_smiles_python(s), s
        natm = native_murcko(s)
        if natm is not CHEM_FALLBACK:
            assert natm == murcko_scaffold_python(s), s


def test_native_fingerprints_bit_exact():
    import numpy as np

    from gctplus_tpu.chem.fingerprints import (morgan_fingerprint,
                                               path_fingerprint)
    from gctplus_tpu.chem.sanitize import mol_from_smiles
    from gctplus_tpu.native import native_morgan, native_pathfp

    for s in CASES:
        mol = mol_from_smiles(s)
        nat = native_morgan(s)
        if nat is CHEM_FALLBACK:
            continue
        if mol is None:
            assert nat is None
            continue
        np.testing.assert_array_equal(nat, morgan_fingerprint(mol), s)
        natp = native_pathfp(s)
        if natp is not CHEM_FALLBACK:
            np.testing.assert_array_equal(natp, path_fingerprint(mol), s)


def test_native_parsed_mol_descriptor_equality():
    """mol_from_smiles rebuilds the C++-parsed graph; every descriptor
    must agree exactly with the pure-Python parse."""
    import numpy as np

    from gctplus_tpu.chem.descriptors import PROPERTY_FN
    from gctplus_tpu.chem.sanitize import (mol_from_smiles,
                                           mol_from_smiles_python)
    from gctplus_tpu.native import native_parse_mol

    for s in CASES:
        mn = native_parse_mol(s)
        if mn is CHEM_FALLBACK:
            continue
        mp = mol_from_smiles_python(s)
        assert (mp is None) == (mn is None), s
        if mp is None:
            continue
        for nm, fn in PROPERTY_FN.items():
            a, b = fn(mp), fn(mn)
            assert a == b or (np.isnan(a) and np.isnan(b)), (s, nm, a, b)
    # the public entry routes through the native parse
    assert mol_from_smiles("c1ccccc1O") is not None


def test_canonical_smiles_uses_native_and_agrees():
    from gctplus_tpu.chem.canonical import (canonical_smiles,
                                            canonical_smiles_python)
    for s in ("c1ccccc1CCN", "C1=CC=CC=C1O", "CC(=O)Oc1ccccc1C(=O)O"):
        assert canonical_smiles(s) == canonical_smiles_python(s)


def test_native_props_batch_exact_vs_python_oracle():
    """gct_chem_props_batch is a full C++ port of the descriptor math
    (logP Wildman-Crippen typing, Ertl tPSA, Bickerton QED incl.
    component counts) — exact float equality vs the Python module on
    the stress cases plus a generated drug-like sample."""
    import numpy as np

    from gctplus_tpu.chem.descriptors import props_row
    from gctplus_tpu.native import NATIVE_PROP_CODES, native_props_batch

    props = ["logP", "tPSA", "QED", "MW", "HBD", "RBN", "ARRN", "AIRN",
             "HAC"]
    assert all(p in NATIVE_PROP_CODES for p in props)
    smis = [s for s in CASES if isinstance(s, str)]
    out = native_props_batch(smis, props)
    assert out is not CHEM_FALLBACK
    vals, status = out
    n_checked = 0
    for i, s in enumerate(smis):
        py = props_row(s, props)
        if status[i] == -2:
            continue
        assert (py is None) == (status[i] == 0), (s, status[i])
        if py is None:
            continue
        np.testing.assert_allclose(vals[i], np.asarray(py), rtol=0,
                                   atol=0, err_msg=s)
        n_checked += 1
    assert n_checked >= 25


def test_native_props_batch_corpus_sample():
    """Exact equality over a drug-like generated corpus sample (the
    protocol hot path: logP/tPSA/QED)."""
    import numpy as np

    from gctplus_tpu.chem.descriptors import props_row, props_rows
    from gctplus_tpu.data.synthetic import generate_dataset
    from gctplus_tpu.native import native_props_batch

    smis = generate_dataset(300, seed=11)
    props = ["logP", "tPSA", "QED"]
    out = native_props_batch(smis, props)
    assert out is not CHEM_FALLBACK
    vals, status = out
    for i, s in enumerate(smis):
        if status[i] != 1:
            continue
        py = props_row(s, props)
        assert py is not None, s
        np.testing.assert_allclose(vals[i], np.asarray(py), rtol=0,
                                   atol=0, err_msg=s)
    # the batched public entry matches the per-row worker incl. fallbacks
    rows = props_rows(smis[:50], props)
    for s, r in zip(smis[:50], rows):
        assert r == props_row(s, props)


def test_analyze_all_matches_split_pipeline():
    """analyze_all (single-parse native batch) must agree exactly with
    the split pipeline: canonicalize_all + murcko per valid canonical
    + smiles_to_morgan + props_row — including raw-vs-canonical input
    invariance of scaffold/fp/props."""
    import numpy as np

    from gctplus_tpu.chem.descriptors import props_row
    from gctplus_tpu.chem.fingerprints import smiles_to_morgan
    from gctplus_tpu.chem.scaffold import murcko_scaffold
    from gctplus_tpu.data.synthetic import generate_dataset
    from gctplus_tpu.eval.metrics import analyze_all, canonicalize_all

    smis = generate_dataset(200, seed=23) + ["not_a_smiles", "C1CC"]
    props = ["logP", "tPSA", "QED"]
    ana = analyze_all(smis, props=props, morgan_bits=1024)
    canon = canonicalize_all(smis, 1)
    assert ana["canonical"] == canon
    for i, (s, c) in enumerate(zip(smis, canon)):
        if c is None:
            assert ana["murcko"][i] is None
            assert ana["props"][i] is None
            continue
        # scaffold/fp/props computed on the RAW string equal the split
        # pipeline's values on the CANONICAL string (order-invariant)
        assert ana["murcko"][i] == murcko_scaffold(c), (s, c)
        np.testing.assert_array_equal(ana["morgan"][i],
                                      smiles_to_morgan(c), err_msg=s)
        assert ana["props"][i] == props_row(c, props), (s, c)
