"""Generation-quality metrics (MOSES get_all_metrics subset, in-repo).

The reference's oracle is moses.get_all_metrics
(Inference/uc_sampling.py:26-39) plus thin wrappers
(Inference/metrics.py:8-61, Utils/metric.py:5-47) and bespoke
scaffold metrics SSF/sim80 (Inference/sca_sampling.py:221-232).
Re-implemented on the in-repo chemistry substrate; the O(n^2)
fingerprint reductions (IntDiv, SNN) ride the MXU via
bulk_tanimoto_matrix.

`Frag/Test` uses the in-repo BRICS-style decomposition
(chem/brics.py) with moses' cosine formula. `Scaf/Test` is moses'
cosine over Murcko-scaffold frequency vectors (scaf_similarity);
the binary set-overlap diagnostic is kept as ScafOverlap. FCD has a
full code path (eval/fcd.py) and runs whenever a local ChemNet
artifact is present; frechet_descriptor_distance is the in-repo
artifact-free stand-in.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np

from gctplus_tpu.chem.canonical import canonical_smiles
from gctplus_tpu.chem.fingerprints import bulk_tanimoto_matrix, smiles_to_morgan
from gctplus_tpu.chem.scaffold import murcko_scaffold, murcko_scaffold_similarity
from gctplus_tpu.chem.mapper import pmap


def canonicalize_all(smiles: Sequence[str], n_jobs: int = 1) -> List[Optional[str]]:
    return pmap(canonical_smiles, smiles, n_jobs)


def fraction_valid(smiles: Sequence[str], n_jobs: int = 1) -> float:
    if len(smiles) == 0:
        return 0.0
    canon = canonicalize_all(smiles, n_jobs)
    return sum(c is not None for c in canon) / len(smiles)


def fraction_unique(smiles: Sequence[str], k: Optional[int] = None,
                    n_jobs: int = 1) -> float:
    """unique@k over VALID canonical forms (moses semantics)."""
    if k is not None:
        smiles = smiles[:k]
    canon = [c for c in canonicalize_all(smiles, n_jobs) if c is not None]
    if not canon:
        return 0.0
    return len(set(canon)) / len(canon)


def novelty(smiles: Sequence[str], train_set: Sequence[str],
            n_jobs: int = 1, train_is_canonical: bool = True) -> float:
    """|unique(gen) - train| / |unique(gen)| — moses semantics over the
    UNIQUE canonical set (also the reference sca aggregation,
    Inference/sca_sampling.py:228)."""
    canon = set(c for c in canonicalize_all(smiles, n_jobs)
                if c is not None)
    if not canon:
        return 0.0
    if train_is_canonical:
        train = set(train_set)
    else:
        train = set(c for c in canonicalize_all(train_set, n_jobs) if c)
    return sum(c not in train for c in canon) / len(canon)


def analyze_all(smiles: Sequence[str], props=None, n_jobs: int = 1,
                morgan_bits: int = 0):
    """One-parse batch analysis for the protocol hot loops: canonical
    SMILES, Murcko scaffold, optional Morgan fingerprints and
    properties, each computed from a SINGLE native parse+sanitize per
    molecule (gct_chem_analyze_batch; the split pipeline re-parsed
    each molecule 3-4x). Returns a dict:

      canonical: List[Optional[str]]   (None = invalid)
      murcko:    List[Optional[str]]   ('' = acyclic valid molecule)
      morgan:    Optional[np.ndarray [n, morgan_bits] uint8]
      props:     Optional[List[Optional[list]]]  (per-row like props_row)

    Exact-equality fallback to the individual Python paths per row
    (oversized molecules) or wholesale (kernel unavailable) — asserted
    in tests/test_native_chem.py."""
    from gctplus_tpu.chem.descriptors import props_row
    from gctplus_tpu.chem.scaffold import murcko_scaffold
    from gctplus_tpu.native import CHEM_FALLBACK, native_analyze_batch

    smiles = list(smiles)
    n = len(smiles)
    out = native_analyze_batch(
        smiles, want_canonical=True, want_murcko=True,
        morgan_bits=morgan_bits, props=list(props) if props else None)
    if out is CHEM_FALLBACK:
        canon = canonicalize_all(smiles, n_jobs)
        res = {"canonical": canon,
               "murcko": [murcko_scaffold(s) if c else None
                          for s, c in zip(smiles, canon)]}
        if morgan_bits:
            fps = np.zeros((n, morgan_bits), np.uint8)
            for i, (s, c) in enumerate(zip(smiles, canon)):
                if c is None:
                    continue
                f = smiles_to_morgan(s, n_bits=morgan_bits)
                if f is not None:
                    fps[i] = f
            res["morgan"] = fps
        if props:
            res["props"] = [props_row(s, props) if c else None
                            for s, c in zip(smiles, canon)]
        return res
    res = {"canonical": out["canonical"], "murcko": out["murcko"]}
    if morgan_bits:
        res["morgan"] = out["morgan"]
    if props:
        res["props"] = [out["props"][i].tolist() if st == 1 else None
                        for i, st in enumerate(out["status"])]
    # per-row fallback for oversized molecules (status -2)
    for i, st in enumerate(out["status"]):
        if st != -2:
            continue
        c = canonical_smiles(smiles[i])
        res["canonical"][i] = c
        res["murcko"][i] = murcko_scaffold(smiles[i]) if c else None
        if morgan_bits and c is not None:
            f = smiles_to_morgan(smiles[i], n_bits=morgan_bits)
            if f is not None:
                res["morgan"][i] = f
        if props:
            res["props"][i] = props_row(smiles[i], props) if c else None
    return res


def _fps(smiles: Sequence[str], n_jobs: int = 1) -> np.ndarray:
    fps = pmap(smiles_to_morgan, smiles, n_jobs)
    fps = [f for f in fps if f is not None]
    if not fps:
        return np.zeros((0, 1024), np.uint8)
    return np.stack(fps)


def internal_diversity(smiles: Sequence[str], n_jobs: int = 1, p: int = 1,
                       block: int = 4096,
                       fps: Optional[np.ndarray] = None) -> float:
    """IntDiv_p = 1 - mean(T^p) over all pairs incl. self (moses)."""
    if fps is None:
        fps = _fps(smiles, n_jobs)
    n = len(fps)
    if n == 0:
        return 0.0
    acc = 0.0
    for i in range(0, n, block):
        a = fps[i: i + block]
        sims = bulk_tanimoto_matrix(a, fps)
        acc += float((sims ** p).sum())
    return 1.0 - (acc / (n * n)) ** (1.0 / p)


def snn(gen: Sequence[str], ref: Sequence[str], n_jobs: int = 1,
        block: int = 4096) -> float:
    """Average nearest-neighbor Tanimoto of gen against ref."""
    g, r = _fps(gen, n_jobs), _fps(ref, n_jobs)
    if len(g) == 0 or len(r) == 0:
        return 0.0
    best = np.zeros(len(g))
    for j in range(0, len(r), block):
        sims = bulk_tanimoto_matrix(g, r[j: j + block])
        best = np.maximum(best, sims.max(axis=1))
    return float(best.mean())


def scaffold_set(smiles: Sequence[str], n_jobs: int = 1) -> set:
    scas = pmap(murcko_scaffold, smiles, n_jobs)
    return set(s for s in scas if s)


def scaf_overlap(gen: Sequence[str], ref: Sequence[str], n_jobs: int = 1) -> float:
    """Fraction of gen molecules whose scaffold appears in ref
    (binary-overlap diagnostic; `scaf_similarity` is the moses metric)."""
    ref_scas = scaffold_set(ref, n_jobs)
    scas = [s for s in pmap(murcko_scaffold, gen, n_jobs) if s is not None]
    if not scas:
        return 0.0
    return sum(s in ref_scas for s in scas) / len(scas)


def scaf_similarity(gen: Sequence[str], ref: Sequence[str],
                    n_jobs: int = 1) -> float:
    """moses `Scaf`: cosine similarity between Murcko-scaffold
    frequency vectors of the two sets (moses/metrics/utils.py
    cos_similarity over compute_scaffolds counts)."""
    from collections import Counter

    g = Counter(s for s in pmap(murcko_scaffold, gen, n_jobs) if s)
    r = Counter(s for s in pmap(murcko_scaffold, ref, n_jobs) if s)
    if not g or not r:
        return float("nan")
    keys = set(g) | set(r)
    gv = np.asarray([g.get(k, 0) for k in keys], float)
    rv = np.asarray([r.get(k, 0) for k in keys], float)
    denom = np.linalg.norm(gv) * np.linalg.norm(rv)
    return float(gv @ rv / denom) if denom else 0.0


def frag_similarity(gen: Sequence[str], ref: Sequence[str],
                    n_jobs: int = 1) -> float:
    """moses `Frag`: cosine similarity between BRICS-style fragment
    frequency vectors of the two sets (chem/brics.py; both sets are
    decomposed with the same rule table)."""
    from gctplus_tpu.chem.brics import fragment_cosine, fragment_counts

    return fragment_cosine(fragment_counts(gen, n_jobs),
                           fragment_counts(ref, n_jobs))


def scaffold_metrics(gen: Sequence[str], target_scaffold: str,
                     n_jobs: int = 1, canonical: bool = False,
                     n_total: Optional[int] = None,
                     return_details: bool = False,
                     scas: Optional[Sequence[Optional[str]]] = None):
    """Reference sca aggregation (Inference/sca_sampling.py:196-234):

    - SSF / sim80 / avg_scaffold_sim over VALID molecules; rows whose
      similarity fails (None) stay in the denominator, as in the
      reference's len(valid);
    - valid_in_tolerance / unique_in_tolerance: exact canonical-
      scaffold match fractions with len(gen) in the denominator
      (:231-232).

    canonical=True skips re-canonicalization (caller already did);
    n_total overrides the all-generated denominator when `gen` holds
    only the valid subset. The target scaffold + every distinct
    generated scaffold is fingerprinted ONCE (the reference recomputes
    both sides per molecule)."""
    from gctplus_tpu.chem.fingerprints import (
        path_fingerprint_from_smiles, tanimoto)

    n_gen = n_total if n_total is not None else len(gen)
    if canonical:
        valid = [s for s in gen if s is not None]
    else:
        valid = [s for s in canonicalize_all(gen, n_jobs) if s is not None]
    zero = {"SSF": 0.0, "sim80": 0.0, "avg_scaffold_sim": 0.0,
            "valid_in_tolerance": 0.0, "unique_in_tolerance": 0.0}
    if not valid or not n_gen:
        return (zero, [], np.zeros(0)) if return_details else zero

    t_sca = murcko_scaffold(target_scaffold)
    t_fp = path_fingerprint_from_smiles(t_sca) if t_sca else None

    if scas is None:
        scas = pmap(murcko_scaffold, valid, n_jobs)
    else:
        scas = list(scas)
        assert len(scas) == len(valid)
    fp_cache: Dict[str, Optional[np.ndarray]] = {}

    def sim_of(s: Optional[str]) -> Optional[float]:
        if s is None or t_sca is None:
            return None
        if s == "" and t_sca == "":
            return 1.0
        if s == "" or t_sca == "":
            return 0.0
        if t_fp is None:
            return None
        if s not in fp_cache:
            fp_cache[s] = path_fingerprint_from_smiles(s)
        fp = fp_cache[s]
        return tanimoto(fp, t_fp) if fp is not None else None

    sims = np.asarray([v if (v := sim_of(s)) is not None else 0.0
                       for s in scas], float)
    n_valid = len(valid)
    seen: set = set()
    uit = 0
    for smi, s in zip(valid, scas):
        if smi in seen:
            continue
        seen.add(smi)
        uit += s == target_scaffold
    out = {
        "SSF": float((sims >= 1.0).sum() / n_valid),
        "sim80": float((sims >= 0.8).sum() / n_valid),
        "avg_scaffold_sim": float(sims.mean()),
        "valid_in_tolerance":
            sum(s == target_scaffold for s in scas) / n_gen,
        "unique_in_tolerance": uit / n_gen,
    }
    # details: per-valid-molecule scaffold strings + similarity array
    # (psca joint-tolerance aggregation reuses them)
    return (out, scas, sims) if return_details else out


def property_error_stats(gen_props: np.ndarray, target: np.ndarray,
                         names: Sequence[str]) -> Dict[str, float]:
    """Per-property error stats with the reference's exact formulas
    (Inference/p_sampling.py:251-259, psca_sampling.py:258-266):
    the 'MSE' column is the SIGNED MEAN error `delp.mean()` — a
    reference quirk kept for column/number parity — MAE is
    `delp.abs().mean()`, SD is `delp.std()` (pandas ddof=1)."""
    out: Dict[str, float] = {}
    err = np.asarray(gen_props, float) - np.asarray(target, float)
    for j, name in enumerate(names):
        e = err[:, j]
        e = e[np.isfinite(e)]
        out[f"{name}_MSE"] = float(np.mean(e)) if len(e) else float("nan")
        out[f"{name}_MAE"] = float(np.mean(np.abs(e))) if len(e) else float("nan")
        out[f"{name}_SD"] = float(np.std(e, ddof=1)) if len(e) > 1 \
            else float("nan")
    return out


def frechet_descriptor_distance(gen: Sequence[str], ref: Sequence[str],
                                n_jobs: int = 1) -> float:
    """Frechet distance between descriptor-space Gaussians — the
    in-repo stand-in for FCD (which needs ChemNet activations):
    d^2 = |mu1-mu2|^2 + Tr(C1 + C2 - 2(C1 C2)^{1/2}) over the
    physchem descriptor vector (eval/kldiv.py feature set),
    z-normalized by the reference statistics."""
    from gctplus_tpu.eval.kldiv import _descriptor_matrix

    g = _descriptor_matrix(gen, n_jobs)
    r = _descriptor_matrix(ref, n_jobs)
    if len(g) < 2 or len(r) < 2:
        return float("nan")
    scale = r.std(axis=0)
    scale[scale == 0] = 1.0
    g = (g - r.mean(axis=0)) / scale
    r = (r - r.mean(axis=0)) / scale
    mu1, mu2 = g.mean(axis=0), r.mean(axis=0)
    c1 = np.cov(g, rowvar=False)
    c2 = np.cov(r, rowvar=False)
    from gctplus_tpu.eval.fcd import frechet_distance
    return frechet_distance(mu1, c1, mu2, c2)


def fcd(gen: Sequence[str], ref: Sequence[str],
        model_path: Optional[str] = None, n_jobs: int = 1) -> float:
    """Frechet ChemNet Distance (full code path in eval/fcd.py).
    Needs a local ChemNet artifact (GCTPLUS_CHEMNET or artifacts/
    chemnet.npz); raises with guidance when none is present."""
    from gctplus_tpu.eval.fcd import fcd as _fcd
    return _fcd(gen, ref, model_path=model_path, n_jobs=n_jobs)


def wasserstein_w1(gen_vals: Sequence[float],
                   ref_vals: Sequence[float]) -> float:
    """1-D Wasserstein-1 distance between two empirical distributions
    (moses WassersteinMetric: scipy.stats.wasserstein_distance)."""
    from scipy.stats import wasserstein_distance

    g = np.asarray(gen_vals, float)
    r = np.asarray(ref_vals, float)
    g, r = g[np.isfinite(g)], r[np.isfinite(r)]
    if len(g) == 0 or len(r) == 0:
        return float("nan")
    return float(wasserstein_distance(g, r))


# moses W1 columns -> in-repo descriptor names (SA=SAS, weight=MW)
_W1_PROPS = (("logP", "logP"), ("SA", "SAS"), ("QED", "QED"),
             ("weight", "MW"))


def _w1_descriptor_distances(gen_valid: Sequence[str],
                             test: Sequence[str],
                             n_jobs: int = 1) -> Dict[str, float]:
    """moses' logP/SA/QED/weight columns: Wasserstein-1 between the
    valid-gen and test descriptor distributions
    (moses/metrics/metrics.py FrechetMetric->WassersteinMetric rows)."""
    from gctplus_tpu.chem.descriptors import props_rows

    names = [src for _, src in _W1_PROPS]
    g = np.asarray([v if v is not None else [np.nan] * len(names)
                    for v in props_rows(gen_valid, names, n_jobs)], float)
    r = np.asarray([v if v is not None else [np.nan] * len(names)
                    for v in props_rows(test, names, n_jobs)], float)
    out = {}
    for j, (col, _) in enumerate(_W1_PROPS):
        out[col] = wasserstein_w1(g[:, j] if g.size else [],
                                  r[:, j] if r.size else [])
    return out


def get_all_metrics(gen: Sequence[str], train: Optional[Sequence[str]] = None,
                    test: Optional[Sequence[str]] = None,
                    test_scaffolds: Optional[Sequence[str]] = None,
                    k: Sequence[int] = (1000, 10000),
                    n_jobs: int = 1) -> Dict[str, float]:
    """The moses.get_all_metrics-shaped report used by uc_sampling
    (reference Inference/uc_sampling.py:26-39 passes train, test AND
    test_scaffolds): valid, unique@k, IntDiv/IntDiv2, Filters,
    novelty, per-reference-split SNN/Frag/Scaf (+FCD when a ChemNet
    artifact is present; the artifact-free Frechet stand-in is always
    emitted under the distinct name FDD), and the logP/SA/QED/weight
    Wasserstein-1 distances vs test."""
    out: Dict[str, float] = {}
    out["valid"] = fraction_valid(gen, n_jobs)
    for kk in k:
        if len(gen) >= kk:
            out[f"unique@{kk}"] = fraction_unique(gen, kk, n_jobs)
    out["unique"] = fraction_unique(gen, None, n_jobs)
    out["IntDiv"] = internal_diversity(gen, n_jobs, p=1)
    out["IntDiv2"] = internal_diversity(gen, n_jobs, p=2)
    from gctplus_tpu.chem.filters import fraction_passes_filters
    out["Filters"] = fraction_passes_filters(gen, n_jobs)
    if train is not None:
        out["novelty"] = novelty(gen, train, n_jobs)
    from gctplus_tpu.eval.fcd import default_chemnet_path
    have_chemnet = default_chemnet_path() is not None
    for split, ref in (("Test", test), ("TestSF", test_scaffolds)):
        if ref is None:
            continue
        out[f"SNN/{split}"] = snn(gen, ref, n_jobs)
        out[f"Frag/{split}"] = frag_similarity(gen, ref, n_jobs)
        out[f"Scaf/{split}"] = scaf_similarity(gen, ref, n_jobs)
        out[f"ScafOverlap/{split}"] = scaf_overlap(gen, ref, n_jobs)
        out[f"FDD/{split}"] = frechet_descriptor_distance(
            gen, ref, n_jobs)
        if have_chemnet:
            out[f"FCD/{split}"] = fcd(gen, ref, n_jobs=n_jobs)
    if test is not None:
        gen_valid = [s for s in canonicalize_all(gen, n_jobs) if s]
        out.update(_w1_descriptor_distances(gen_valid, test, n_jobs))
    return out
