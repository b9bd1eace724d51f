"""moses-style medchem filter pass (the `Filters` metric column).

The reference reports moses.get_all_metrics
(/root/reference/Inference/uc_sampling.py:26-39); its `Filters`
column is the fraction of valid molecules passing
moses/metrics/utils.py::mol_passes_filters:

  1. no ring of size >= 8,
  2. every formal charge is 0,
  3. every atom in the allowed set {C, N, S, O, F, Cl, Br, H},
  4. no MCF or PAINS SMARTS alert fires,
  5. the molecule survives a canonicalize round-trip.

In-repo approximation (PARITY.md §6): stage 4 replaces the mcf.csv +
wehi_pains.csv SMARTS tables (data artifacts, not algorithms) with
the programmatic structural-alert engine already used for QED/Brenk
(chem/descriptors.py::_ALERT_CHECKS) plus the MCF-specific checks
below. Alert-free drug-like molecules — the MOSES regime, where
Filters ~0.99+ for trained models — behave identically; molecules
carrying exotic alerts may be scored differently from RDKit+moses.
"""

from __future__ import annotations

from typing import Optional, Sequence

from gctplus_tpu.chem.descriptors import _ALERT_CHECKS
from gctplus_tpu.chem.mapper import pmap
from gctplus_tpu.chem.mol import Mol
from gctplus_tpu.chem.sanitize import mol_from_smiles

ALLOWED_ATOMS = frozenset({"C", "N", "S", "O", "F", "Cl", "Br", "H"})


def _has_long_chain(mol: Mol, min_len: int = 7) -> bool:
    """MCF no-long-alkyl-chain rule ([CH2] x >= ~7): longest path of
    saturated acyclic CH2 carbons."""
    ring_atoms = set()
    for ring in mol.ring_info():
        ring_atoms.update(ring)
    is_ch2 = [
        a.symbol == "C" and not a.aromatic and a.idx not in ring_atoms
        and a.n_h == 2 and a.charge == 0
        and all(b.order == 1.0 for b in mol.bonds_of(a.idx))
        for a in mol.atoms
    ]
    best = 0
    for start in range(len(mol.atoms)):
        if not is_ch2[start]:
            continue
        # chains are paths in a degree-<=2 subgraph: walk both ways
        seen = {start}
        frontier = [start]
        while frontier:
            nxt = []
            for i in frontier:
                for j in mol.neighbors(i):
                    if is_ch2[j] and j not in seen:
                        seen.add(j)
                        nxt.append(j)
            frontier = nxt
        best = max(best, len(seen))
        if best >= min_len:
            return True
    return False


def _mcf_extra_alerts(mol: Mol) -> bool:
    """MCF rules not covered by the Brenk-style _ALERT_CHECKS subset:
    3-membered heterocycles (epoxide/aziridine), acyl halides,
    iso(thio)cyanates, long alkyl chains."""
    for ring in mol.ring_info():
        if len(ring) == 3 and any(
                mol.atoms[a].symbol in ("N", "O", "S") for a in ring):
            return True
    for a in mol.atoms:
        if a.symbol == "C" and not a.aromatic:
            bonds = mol.bonds_of(a.idx)
            has_dbl_o = any(b.order == 2.0 and
                            mol.atoms[b.other(a.idx)].symbol == "O"
                            for b in bonds)
            if has_dbl_o and any(
                    mol.atoms[b.other(a.idx)].symbol in ("Cl", "Br", "I")
                    for b in bonds):
                return True  # acyl halide
            # N=C=O / N=C=S
            dbl = [b for b in bonds if b.order == 2.0]
            if len(dbl) == 2:
                syms = sorted(mol.atoms[b.other(a.idx)].symbol for b in dbl)
                if syms in (["N", "O"], ["N", "S"]):
                    return True
    return _has_long_chain(mol)


def mol_passes_filters(smiles_or_mol) -> bool:
    """In-repo analog of moses mol_passes_filters (docstring above)."""
    if isinstance(smiles_or_mol, Mol):
        mol = smiles_or_mol
    else:
        mol = mol_from_smiles(smiles_or_mol)
    if mol is None:
        return False
    for ring in mol.ring_info():
        if len(ring) >= 8:
            return False
    for a in mol.atoms:
        if a.charge != 0:
            return False
        if a.symbol not in ALLOWED_ATOMS:
            return False
    if any(chk(mol) for chk in _ALERT_CHECKS):
        return False
    if _mcf_extra_alerts(mol):
        return False
    return True


def fraction_passes_filters(smiles: Sequence[str], n_jobs: int = 1) -> float:
    """`Filters`: fraction of VALID molecules passing the filter set
    (moses computes it over the canonicalized valid subset)."""
    flags = pmap(_passes_if_valid, smiles, n_jobs)
    flags = [f for f in flags if f is not None]
    if not flags:
        return 0.0
    return sum(flags) / len(flags)


def _passes_if_valid(smi: str) -> Optional[bool]:
    mol = mol_from_smiles(smi)
    if mol is None:
        return None
    return mol_passes_filters(mol)
