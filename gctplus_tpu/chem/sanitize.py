"""Sanitization: kekulization, implicit-H assignment, valence check.

This is the validity oracle replacing RDKit's SanitizeMol in the
reference's `get_mol` (Utils/smiles.py:30-44): a SMILES is "valid" iff
it parses AND sanitizes. The model: parse -> decide which aromatic
atoms need a pi bond -> perfect matching on the aromatic subgraph
(kekulization) -> implicit hydrogens from (charge-adjusted) default
valences -> final valence check.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Set, Tuple

from gctplus_tpu.chem.mol import DEFAULT_VALENCES, Mol
from gctplus_tpu.chem.smiles_parser import SmilesError, parse_smiles


class SanitizeError(ValueError):
    pass


_CHARGED_VALENCES = {
    ("N", 1): (4,), ("N", -1): (2,),
    ("P", 1): (4, 6), ("P", -1): (2,),
    ("O", 1): (3,), ("O", -1): (1,),
    ("S", 1): (3, 5), ("S", -1): (1,),
    ("C", 1): (3,), ("C", -1): (3,),
    ("B", -1): (4,), ("B", 1): (2,),
}


def allowed_valences(symbol: str, charge: int) -> Optional[Tuple[int, ...]]:
    if charge == 0:
        return DEFAULT_VALENCES.get(symbol)
    v = _CHARGED_VALENCES.get((symbol, charge))
    if v is not None:
        return v
    return None  # exotic charge state: be lenient


def _pi_target_valence(symbol: str, charge: int) -> Optional[int]:
    """Single target valence used for aromatic-atom pi accounting."""
    v = allowed_valences(symbol, charge)
    if v is None:
        return None
    return v[0]


def sanitize(mol: Mol) -> Mol:
    """In-place sanitize; raises SanitizeError. Returns mol."""
    n = mol.num_atoms()
    arom_deg = [0] * n
    exo_sum = [0.0] * n
    exo_multi = [0.0] * n  # exocyclic bond order beyond single
    for b in mol.bonds:
        for a in (b.a1, b.a2):
            if b.aromatic:
                arom_deg[a] += 1
            else:
                exo_sum[a] += b.order
                exo_multi[a] += b.order - 1.0

    pi_needed: Set[int] = set()
    for atom in mol.atoms:
        i = atom.idx
        if arom_deg[i] > 0 and not atom.aromatic:
            raise SanitizeError(f"aromatic bond to non-aromatic atom {i}")
        if not atom.aromatic:
            continue
        if arom_deg[i] < 2:
            raise SanitizeError(
                f"aromatic atom {i} ({atom.symbol}) not in an aromatic ring")
        if arom_deg[i] > 3:
            raise SanitizeError(f"aromatic atom {i} with {arom_deg[i]} aromatic bonds")
        sym, q = atom.symbol, atom.charge
        sigma = arom_deg[i] + exo_sum[i]
        if not atom.in_bracket:
            # OpenSMILES organic-subset aromatic atoms
            if sym == "C":
                if exo_multi[i] >= 1:  # exocyclic double: no ring pi
                    h = 4 - sigma
                else:
                    pi_needed.add(i)
                    h = 4 - sigma - 1
            elif sym in ("N", "P"):
                h = 0
                if sigma == 2:
                    pi_needed.add(i)  # pyridine-like
                # sigma==3 -> pyrrole-like (no pi, no H)
            elif sym in ("O", "S"):
                h = 0  # furan/thiophene-like, no pi
            elif sym == "B":
                h = 0
            else:
                raise SanitizeError(f"bad aromatic organic atom {sym}")
            if h < 0 or h != int(h):
                raise SanitizeError(f"valence error on aromatic atom {i}")
            atom.n_h = int(h)
        else:
            atom.n_h = atom.explicit_h or 0
            target = _pi_target_valence(sym, q)
            if target is None:
                continue  # lenient for exotic atoms
            need = target - (sigma + atom.n_h)
            if need == 1:
                pi_needed.add(i)
            elif need != 0:
                raise SanitizeError(
                    f"cannot kekulize atom {i} ({sym}{q:+d}): "
                    f"pi need {need}")

    _kekulize(mol, pi_needed)

    # aliphatic implicit H + global valence check on the kekule graph
    for atom in mol.atoms:
        i = atom.idx
        bond_sum = sum(b.order for b in mol.bonds_of(i))
        if bond_sum != int(bond_sum):
            raise SanitizeError("unkekulized aromatic bond survived")
        bond_sum = int(bond_sum)
        atom.degree = len(mol.neighbors(i))
        if atom.aromatic:
            pass  # n_h already set above
        elif atom.in_bracket:
            atom.n_h = atom.explicit_h or 0
        else:
            if atom.charge != 0:
                raise SanitizeError("charged atom outside brackets")
            vlist = DEFAULT_VALENCES.get(atom.symbol)
            if vlist is None:
                raise SanitizeError(f"unknown organic atom {atom.symbol}")
            v = next((v for v in vlist if v >= bond_sum), None)
            if v is None:
                raise SanitizeError(
                    f"valence {bond_sum} too high for {atom.symbol} (atom {i})")
            atom.n_h = v - bond_sum
        total = bond_sum + atom.n_h
        vlist = allowed_valences(atom.symbol, atom.charge)
        if vlist is not None and total > max(vlist):
            raise SanitizeError(
                f"explicit valence {total} > max {max(vlist)} for "
                f"{atom.symbol}{atom.charge:+d} (atom {i})")

    # kekule-input rings that satisfy Hueckel get aromatized so both
    # written forms canonicalize identically (chem/aromatic.py)
    from gctplus_tpu.chem.aromatic import perceive_aromaticity
    perceive_aromaticity(mol)
    return mol


def _kekulize(mol: Mol, pi_needed: Set[int]):
    """Assign alternating double bonds over aromatic bonds: a perfect
    matching covering every pi-needing atom (exact backtracking; ring
    systems are small). Matched aromatic bonds get order 2, the rest 1;
    aromatic flags are preserved for output."""
    # candidate edges between two pi atoms
    adj: Dict[int, List[Tuple[int, int]]] = {a: [] for a in pi_needed}
    for bi, b in enumerate(mol.bonds):
        if b.aromatic and b.a1 in pi_needed and b.a2 in pi_needed:
            adj[b.a1].append((b.a2, bi))
            adj[b.a2].append((b.a1, bi))

    match: Dict[int, int] = {}

    def backtrack(remaining: List[int]) -> bool:
        while remaining and remaining[-1] in match:
            remaining = remaining[:-1]
        if not remaining:
            return True
        # most-constrained-first
        remaining = sorted(
            (a for a in remaining if a not in match),
            key=lambda a: sum(1 for (nb, _) in adj[a] if nb not in match))
        a = remaining[0]
        cands = [(nb, bi) for (nb, bi) in adj[a] if nb not in match]
        if not cands:
            return False
        for nb, bi in cands:
            match[a] = bi
            match[nb] = bi
            if backtrack(remaining[1:]):
                return True
            del match[a]
            del match[nb]
        return False

    if not backtrack(sorted(pi_needed)):
        raise SanitizeError("kekulization failed: no perfect matching")

    double_bonds = set(match.values())
    for bi, b in enumerate(mol.bonds):
        if b.aromatic:
            b.order = 2.0 if bi in double_bonds else 1.0


def mol_from_smiles(smiles: str) -> Optional[Mol]:
    """Parse + sanitize; None on failure (reference get_mol semantics,
    Utils/smiles.py:30-44).

    Fast path: parse+sanitize+ring-perception run in the native kernel
    (native/chem.cpp) and the graph is rebuilt here — descriptor and
    property sweeps were bounded by the Python parse."""
    if isinstance(smiles, str):
        from gctplus_tpu.native import CHEM_FALLBACK, native_parse_mol
        out = native_parse_mol(smiles)
        if out is not CHEM_FALLBACK:
            return out
    return mol_from_smiles_python(smiles)


def mol_from_smiles_python(smiles: str) -> Optional[Mol]:
    """The pure-Python path (also the native kernel's oracle)."""
    try:
        return sanitize(parse_smiles(smiles))
    except (SmilesError, SanitizeError, Exception):
        return None


def is_valid_smiles(smiles: str) -> bool:
    if isinstance(smiles, str):
        from gctplus_tpu.native import CHEM_FALLBACK, native_is_valid
        out = native_is_valid(smiles)
        if out is not CHEM_FALLBACK:
            return out
    return mol_from_smiles(smiles) is not None
