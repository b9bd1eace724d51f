"""SMILES string -> Mol graph parser.

Grammar per the OpenSMILES spec subset used by MOSES/ChEMBL-scale
drug-like molecules (see chem/mol.py docstring). Replaces RDKit's
MolFromSmiles for the framework's validity/canonicalization needs
(reference usage: Utils/smiles.py:30-44).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from gctplus_tpu.chem.mol import (
    AROMATIC_OK,
    BOND_ORDER,
    ORGANIC_SUBSET,
    Atom,
    Mol,
)


class SmilesError(ValueError):
    pass


_BRACKET_RE = re.compile(
    r"^(?P<isotope>\d+)?"
    r"(?P<symbol>[A-Z][a-z]?|[bcnops]|se|as|te|si)"
    r"(?P<chiral>@{1,2}(?:TH\d|AL\d|SP\d|TB\d+|OH\d+)?)?"
    r"(?P<hcount>H\d*)?"
    r"(?P<charge>\+{1,3}|-{1,3}|\+\d+|-\d+)?"
    r"(?::(?P<map>\d+))?$"
)

_TWO_CHAR_ORGANIC = {"Cl", "Br"}
_FLIP_DIR = {"/": "\\", "\\": "/"}


def _parse_bracket(body: str) -> Atom:
    m = _BRACKET_RE.match(body)
    if not m:
        raise SmilesError(f"bad bracket atom: [{body}]")
    sym = m.group("symbol")
    aromatic = sym[0].islower()
    symbol = sym.capitalize() if aromatic else sym
    if aromatic and symbol not in AROMATIC_OK:
        raise SmilesError(f"atom {sym} cannot be aromatic")
    iso = int(m.group("isotope") or 0)
    h = m.group("hcount")
    if h is None:
        hcount = 0
    elif h == "H":
        hcount = 1
    else:
        hcount = int(h[1:])
    c = m.group("charge")
    if c is None:
        charge = 0
    elif c[0] in "+-" and len(c) > 1 and c[1:].isdigit():
        charge = int(c[1:]) * (1 if c[0] == "+" else -1)
    else:
        charge = c.count("+") - c.count("-")
    chiral = m.group("chiral")
    return Atom(symbol=symbol, aromatic=aromatic, charge=charge,
                explicit_h=hcount, isotope=iso, chiral=chiral,
                in_bracket=True)


def parse_smiles(smiles: str) -> Mol:
    """Parse; raises SmilesError on malformed input. Does NOT sanitize
    (valence/kekulization) — see chem/sanitize.py."""
    if not smiles or not isinstance(smiles, str):
        raise SmilesError("empty SMILES")
    mol = Mol()
    prev: Optional[int] = None
    stack: List[Optional[int]] = []
    pending_bond: Optional[str] = None
    ring: Dict[int, Tuple[int, Optional[str]]] = {}
    # chiral-neighbor accounting (OpenSMILES §3.9.2): for every atom
    # carrying @/@@, the neighbor list in WRITTEN order — preceding
    # atom, implicit bracket H (-1), then ring digits / branch atoms
    # as they appear. Ring digits opened on a chiral atom reserve a
    # slot (None) that is patched with the partner at closure.
    chiral_order: Dict[int, List[Optional[int]]] = {}
    ring_slot: Dict[int, Tuple[int, int]] = {}

    def note_new_atom(atom: Atom, old_prev: Optional[int], idx: int):
        if old_prev is not None and old_prev in chiral_order:
            chiral_order[old_prev].append(idx)
        if atom.chiral:
            lst: List[Optional[int]] = [] if old_prev is None else [old_prev]
            if (atom.explicit_h or 0) == 1:
                lst.append(-1)
            chiral_order[idx] = lst

    i, n = 0, len(smiles)
    while i < n:
        ch = smiles[i]

        if ch == "[":
            j = smiles.find("]", i)
            if j < 0:
                raise SmilesError("unclosed bracket")
            atom = _parse_bracket(smiles[i + 1: j])
            i = j + 1
            new = _attach(mol, atom, prev, pending_bond)
            note_new_atom(atom, prev, new)
            prev = new
            pending_bond = None
            continue

        if ch.isalpha():
            if ch.isupper():
                two = smiles[i: i + 2]
                if two in _TWO_CHAR_ORGANIC:
                    sym, i = two, i + 2
                else:
                    sym, i = ch, i + 1
                if sym not in ORGANIC_SUBSET:
                    raise SmilesError(f"element {sym} needs brackets")
                atom = Atom(symbol=sym, aromatic=False)
            else:
                if ch not in "bcnops":
                    raise SmilesError(f"bad aromatic atom {ch}")
                atom = Atom(symbol=ch.upper(), aromatic=True)
                i += 1
            new = _attach(mol, atom, prev, pending_bond)
            note_new_atom(atom, prev, new)
            prev = new
            pending_bond = None
            continue

        if ch in BOND_ORDER:
            if pending_bond is not None:
                raise SmilesError("two consecutive bond symbols")
            pending_bond = ch
            i += 1
            continue

        if ch == "(":
            if prev is None:
                raise SmilesError("branch before any atom")
            stack.append(prev)
            i += 1
            continue

        if ch == ")":
            if not stack:
                raise SmilesError("unmatched ')'")
            prev = stack.pop()
            i += 1
            continue

        if ch.isdigit() or ch == "%":
            if ch == "%":
                if i + 2 >= n or not smiles[i + 1: i + 3].isdigit():
                    raise SmilesError("bad %NN ring bond")
                num, i = int(smiles[i + 1: i + 3]), i + 3
            else:
                num, i = int(ch), i + 1
            if prev is None:
                raise SmilesError("ring bond before any atom")
            if num in ring:
                a_other, sym_other = ring.pop(num)
                # Bond.stereo is normalized to the a1->a2 (opener ->
                # closer) orientation; a directional symbol written at
                # the CLOSING digit points closer -> opener, so it is
                # flipped here. Opener '/' + closer '\' describe the
                # same geometry (consistent); equal symbols conflict.
                if pending_bond in ("/", "\\"):
                    if sym_other in ("/", "\\") and sym_other == pending_bond:
                        raise SmilesError("conflicting ring-bond directions")
                    sym = _FLIP_DIR[pending_bond]
                elif (pending_bond and sym_other
                      and pending_bond != sym_other):
                    raise SmilesError("conflicting ring-bond orders")
                else:
                    sym = pending_bond or sym_other
                _bond(mol, a_other, prev, sym)
                if prev in chiral_order:
                    chiral_order[prev].append(a_other)
                if num in ring_slot:
                    a, pos = ring_slot.pop(num)
                    chiral_order[a][pos] = prev
                pending_bond = None
            else:
                ring[num] = (prev, pending_bond)
                if prev in chiral_order:
                    chiral_order[prev].append(None)
                    ring_slot[num] = (prev, len(chiral_order[prev]) - 1)
                pending_bond = None
            continue

        if ch == ".":
            if pending_bond is not None:
                raise SmilesError("bond before dot")
            prev = None
            i += 1
            continue

        raise SmilesError(f"unexpected character {ch!r} at {i}")

    if stack:
        raise SmilesError("unclosed branch")
    if ring:
        raise SmilesError(f"unclosed ring bond(s): {sorted(ring)}")
    if pending_bond is not None:
        raise SmilesError("dangling bond symbol")
    if mol.num_atoms() == 0:
        raise SmilesError("no atoms")
    for idx, lst in chiral_order.items():
        # no None slot can survive: unclosed rings raised above
        mol.atoms[idx].chiral_order = lst
    return mol


def _attach(mol: Mol, atom: Atom, prev: Optional[int],
            bond_sym: Optional[str]) -> int:
    idx = mol.add_atom(atom)
    if prev is not None:
        _bond(mol, prev, idx, bond_sym)
    elif bond_sym is not None:
        raise SmilesError("bond with no previous atom")
    return idx


def _bond(mol: Mol, a1: int, a2: int, sym: Optional[str]):
    try:
        if sym is None:
            if mol.atoms[a1].aromatic and mol.atoms[a2].aromatic:
                mol.add_bond(a1, a2, 1.5, aromatic=True)
            else:
                mol.add_bond(a1, a2, 1.0)
        elif sym == ":":
            mol.add_bond(a1, a2, 1.5, aromatic=True)
        elif sym in ("/", "\\"):
            mol.add_bond(a1, a2, 1.0, stereo=sym)
        elif sym == "~":
            mol.add_bond(a1, a2, 1.0)
        else:
            mol.add_bond(a1, a2, BOND_ORDER[sym])
    except ValueError as e:
        raise SmilesError(str(e)) from None
