"""ctypes bindings for the native tokenizer/encoder and chemistry
kernel.

Builds libgcttok.so / libgctchem.so on first use (g++ -O3 -shared);
falls back to the pure-Python implementations transparently when no
compiler is available. The chemistry kernel (chem.cpp) is an
equivalence-tested port of chem/{smiles_parser,sanitize,canonical,
scaffold}.py — byte-identical canonical strings (see
tests/test_native_chem.py); set GCTPLUS_NO_NATIVE_CHEM=1 to force the
Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence, Tuple

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "tokenizer.cpp")
_SO = os.path.join(_HERE, "libgcttok.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        if not os.path.exists(_SO) or (
                os.path.getmtime(_SO) < os.path.getmtime(_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     _SRC, "-o", _SO],
                    check=True, capture_output=True, timeout=120)
            except Exception:
                _build_failed = True
                return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            _build_failed = True
            return None
        lib.gct_vocab_new.restype = ctypes.c_void_p
        lib.gct_vocab_new.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.c_int32, ctypes.c_int32]
        lib.gct_vocab_free.argtypes = [ctypes.c_void_p]
        lib.gct_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32, ctypes.POINTER(ctypes.c_int32), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32, ctypes.c_int32,
            ctypes.c_int32]
        lib.gct_count_tokens.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int32]
        _lib = lib
        return _lib


def native_available() -> bool:
    return _load() is not None


# --------------------------------------------------------------------
# chemistry kernel (chem.cpp): canonical SMILES + Murcko scaffolds
# --------------------------------------------------------------------

_CHEM_SRC = os.path.join(_HERE, "chem.cpp")
_CHEM_SO = os.path.join(_HERE, "libgctchem.so")
_chem_lib = None
_chem_failed = False

# sentinel: the native kernel declined (molecule too large for its
# fixed bitset) — caller must use the Python path
CHEM_FALLBACK = object()


def _load_chem() -> Optional[ctypes.CDLL]:
    global _chem_lib, _chem_failed
    with _lock:
        if _chem_lib is not None:
            return _chem_lib
        if _chem_failed or os.environ.get("GCTPLUS_NO_NATIVE_CHEM"):
            return None
        if not os.path.exists(_CHEM_SO) or (
                os.path.getmtime(_CHEM_SO) < os.path.getmtime(_CHEM_SRC)):
            try:
                subprocess.run(
                    ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
                     _CHEM_SRC, "-o", _CHEM_SO],
                    check=True, capture_output=True, timeout=300)
            except Exception:
                _chem_failed = True
                return None
        try:
            lib = ctypes.CDLL(_CHEM_SO)
        except OSError:
            _chem_failed = True
            return None
        for fn in ("gct_chem_canonical", "gct_chem_murcko"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [
                ctypes.c_char_p, ctypes.c_char_p, ctypes.c_int]
        lib.gct_chem_is_valid.restype = ctypes.c_int
        lib.gct_chem_is_valid.argtypes = [ctypes.c_char_p]
        for fn in ("gct_chem_morgan", "gct_chem_pathfp"):
            getattr(lib, fn).restype = ctypes.c_int
            getattr(lib, fn).argtypes = [
                ctypes.c_char_p, ctypes.POINTER(ctypes.c_uint8),
                ctypes.c_int, ctypes.c_int]
        lib.gct_chem_parse.restype = ctypes.c_int
        lib.gct_chem_parse.argtypes = [
            ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.gct_chem_analyze_batch.restype = None
        lib.gct_chem_analyze_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
            ctypes.c_char_p, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int8)]
        lib.gct_chem_props_batch.restype = None
        lib.gct_chem_props_batch.argtypes = [
            ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
            ctypes.POINTER(ctypes.c_double), ctypes.POINTER(ctypes.c_int8)]
        _chem_lib = lib
        return _chem_lib


def chem_native_available() -> bool:
    return _load_chem() is not None


_BUF_CAP = 8192


def native_canonical(smiles: str):
    """canonical SMILES | None (invalid) | CHEM_FALLBACK."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    buf = ctypes.create_string_buffer(_BUF_CAP)
    rc = lib.gct_chem_canonical(smiles.encode(), buf, _BUF_CAP)
    if rc == -1:
        return None
    if rc == -2:
        return CHEM_FALLBACK
    return buf.value.decode()


def native_murcko(smiles: str):
    """scaffold SMILES ('' acyclic) | None | CHEM_FALLBACK."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    buf = ctypes.create_string_buffer(_BUF_CAP)
    rc = lib.gct_chem_murcko(smiles.encode(), buf, _BUF_CAP)
    if rc == -1:
        return None
    if rc == -2:
        return CHEM_FALLBACK
    return buf.value.decode()


def native_is_valid(smiles: str):
    """True | False | CHEM_FALLBACK."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    rc = lib.gct_chem_is_valid(smiles.encode())
    if rc == -2:
        return CHEM_FALLBACK
    return bool(rc)


def native_morgan(smiles: str, n_bits: int = 1024, radius: int = 2):
    """uint8 bit vector | None (invalid) | CHEM_FALLBACK."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    out = np.zeros(n_bits, np.uint8)
    rc = lib.gct_chem_morgan(
        smiles.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_bits, radius)
    if rc == -2:
        return CHEM_FALLBACK
    return out if rc == 1 else None


# property codes shared with gct_chem_props_batch (chem.cpp)
NATIVE_PROP_CODES = {
    "logP": 0, "tPSA": 1, "QED": 2, "MW": 3, "HBD": 4, "RBN": 5,
    "ARRN": 6, "AIRN": 7, "HAC": 8, "QED_HBA": 9, "ALERTS": 10,
}


def native_props_batch(smiles: Sequence[str], props: Sequence[str]):
    """Batch molecular properties in C++ (equivalence port of
    chem/descriptors.py — see tests/test_native_chem.py).

    Returns (values float64 [n, len(props)], status int8 [n]) where
    status is 1 ok, 0 invalid, -2 fall back to Python for that row;
    or CHEM_FALLBACK when the kernel or a property is unavailable."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    try:
        codes = np.asarray([NATIVE_PROP_CODES[p] for p in props],
                           np.int32)
    except KeyError:
        return CHEM_FALLBACK
    n = len(smiles)
    vals = np.zeros((n, len(props)), np.float64)
    status = np.zeros(n, np.int8)
    arr = (ctypes.c_char_p * n)(*[s.encode() for s in smiles])
    lib.gct_chem_props_batch(
        arr, n, codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(props), vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    return vals, status


def native_analyze_batch(smiles: Sequence[str],
                         want_canonical: bool = True,
                         want_murcko: bool = True,
                         morgan_bits: int = 0, morgan_radius: int = 2,
                         props: Optional[Sequence[str]] = None,
                         slot_cap: int = 1024):
    """One-parse batch analysis (gct_chem_analyze_batch): canonical
    SMILES + Murcko scaffold + Morgan bits + properties from a single
    parse+sanitize per molecule. Returns a dict with keys among
    {"canonical", "murcko", "morgan", "props"} plus "status" (int8:
    1 ok, 0 invalid, -2 fall back per row), or CHEM_FALLBACK when the
    kernel / a requested property is unavailable."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    codes = None
    if props:
        try:
            codes = np.asarray([NATIVE_PROP_CODES[p] for p in props],
                               np.int32)
        except KeyError:
            return CHEM_FALLBACK
    n = len(smiles)
    arr = (ctypes.c_char_p * n)(*[s.encode() for s in smiles])
    canon_buf = ctypes.create_string_buffer(n * slot_cap)         if want_canonical else None
    mur_buf = ctypes.create_string_buffer(n * slot_cap)         if want_murcko else None
    mg = (np.zeros((n, morgan_bits), np.uint8) if morgan_bits else None)
    pv = (np.zeros((n, len(props)), np.float64) if codes is not None
          else None)
    status = np.zeros(n, np.int8)
    lib.gct_chem_analyze_batch(
        arr, n,
        canon_buf, slot_cap if want_canonical else 0,
        mur_buf, slot_cap if want_murcko else 0,
        (mg.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
         if mg is not None else None),
        morgan_bits, morgan_radius,
        (codes.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
         if codes is not None else None),
        0 if codes is None else len(props),
        (pv.ctypes.data_as(ctypes.POINTER(ctypes.c_double))
         if pv is not None else None),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)))
    out = {"status": status}
    if want_canonical:
        out["canonical"] = [
            ctypes.string_at(ctypes.addressof(canon_buf)
                             + i * slot_cap).decode()
            if status[i] == 1 else None for i in range(n)]
    if want_murcko:
        out["murcko"] = [
            ctypes.string_at(ctypes.addressof(mur_buf)
                             + i * slot_cap).decode()
            if status[i] == 1 else None for i in range(n)]
    if mg is not None:
        out["morgan"] = mg
    if pv is not None:
        out["props"] = pv
    return out


_CHIRAL = {0: None, 1: "@", 2: "@@"}
_STEREO = {0: None, 1: "/", 2: "\\"}


def native_parse_mol(smiles: str):
    """Parse+sanitize in C++ and rebuild the Python Mol graph (the
    dominant cost of descriptor/property sweeps is the Python parse).
    Returns Mol | None (invalid) | CHEM_FALLBACK. The chiral suffix
    strings (@TH1 etc.) collapse to '@'/'@@' — only truthiness is
    consumed downstream (descriptors.py SAS stereo penalty)."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    buf = np.zeros(32768, np.int32)
    rc = lib.gct_chem_parse(
        smiles.encode(), buf.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        len(buf))
    if rc == -2:
        return CHEM_FALLBACK
    if rc == -1:
        return None
    from gctplus_tpu.chem.mol import Atom, Bond, Mol

    n, m, n_rings, _ = int(buf[0]), int(buf[1]), int(buf[2]), int(buf[3])
    p = 4
    mol = Mol()
    atoms = mol.atoms
    adj = mol._adj
    for i in range(n):
        c1, c2, arom, charge, eh, iso, inb, n_h, deg, chi = \
            buf[p: p + 10]
        p += 10
        sym = chr(c1) + (chr(c2) if c2 else "")
        a = Atom(symbol=sym, aromatic=bool(arom), charge=int(charge),
                 explicit_h=(None if eh == -1 else int(eh)),
                 isotope=int(iso), chiral=_CHIRAL[int(chi)],
                 in_bracket=bool(inb), idx=i, n_h=int(n_h),
                 degree=int(deg))
        atoms.append(a)
        adj[i] = []
    for bi in range(m):
        a1, a2, order2, arom, stereo = buf[p: p + 5]
        p += 5
        mol.bonds.append(Bond(int(a1), int(a2), int(order2) / 2.0,
                              bool(arom), _STEREO[int(stereo)]))
        adj[int(a1)].append(bi)
        adj[int(a2)].append(bi)
    lens = [int(x) for x in buf[p: p + n_rings]]
    p += n_rings
    rings = []
    for ln in lens:
        rings.append([int(x) for x in buf[p: p + ln]])
        p += ln
    mol._ring_cache = rings
    return mol


def native_pathfp(smiles: str, n_bits: int = 2048, max_len: int = 7):
    """uint8 bit vector | None (invalid) | CHEM_FALLBACK."""
    lib = _load_chem()
    if lib is None:
        return CHEM_FALLBACK
    out = np.zeros(n_bits, np.uint8)
    rc = lib.gct_chem_pathfp(
        smiles.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        n_bits, max_len)
    if rc == -2:
        return CHEM_FALLBACK
    return out if rc == 1 else None


class NativeEncoder:
    """Vocab-bound batch encoder. Mirrors
    Vocab.encode + pad_batch + sos/eos handling in one native call."""

    def __init__(self, vocab):
        lib = _load()
        if lib is None:
            raise RuntimeError("native tokenizer unavailable")
        self._lib = lib
        self._itos = list(vocab.itos)
        arr = (ctypes.c_char_p * len(self._itos))(
            *[t.encode() for t in self._itos])
        sep = vocab.sep_id if vocab.sep_id is not None else -1
        self._handle = lib.gct_vocab_new(arr, len(self._itos),
                                         vocab.stoi.get("<unk>", 0), sep)
        self.pad_id = vocab.pad_id
        self.sos_id = vocab.sos_id
        self.eos_id = vocab.eos_id

    def __del__(self):
        try:
            self._lib.gct_vocab_free(self._handle)
        except Exception:
            pass

    def encode_batch(self, smiles: Sequence[str], max_len: int,
                     add_sos: bool = False, add_eos: bool = False,
                     handle_sep: bool = True
                     ) -> Tuple[np.ndarray, np.ndarray]:
        n = len(smiles)
        out = np.full((n, max_len), self.pad_id, np.int32)
        lengths = np.zeros(n, np.int32)
        arr = (ctypes.c_char_p * n)(*[s.encode() for s in smiles])
        self._lib.gct_encode_batch(
            self._handle, arr, n,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)), max_len,
            lengths.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            self.sos_id if add_sos and self.sos_id is not None else -1,
            self.eos_id if add_eos and self.eos_id is not None else -1,
            1 if handle_sep else 0)
        return out, lengths


def count_tokens(smiles: Sequence[str], handle_sep: bool = False
                 ) -> np.ndarray:
    lib = _load()
    if lib is None:
        from gctplus_tpu.chem.tokenizer import SmilesTokenizer
        tok = SmilesTokenizer(add_sep=handle_sep)
        return np.asarray([len(tok(s)) for s in smiles], np.int32)
    n = len(smiles)
    counts = np.zeros(n, np.int32)
    arr = (ctypes.c_char_p * n)(*[s.encode() for s in smiles])
    lib.gct_count_tokens(
        arr, n, counts.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        1 if handle_sep else 0)
    return counts
