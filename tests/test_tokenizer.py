from gctplus_tpu.chem.tokenizer import SmilesTokenizer, untokenize
from gctplus_tpu.chem.vocab import Vocab, build_vocab_pair


def test_basic_tokens():
    t = SmilesTokenizer()
    assert t("CCO") == ["C", "C", "O"]
    assert t("c1ccccc1") == ["c", "1", "c", "c", "c", "c", "c", "1"]
    assert t("CC(=O)Nc1ccc(O)cc1") == [
        "C", "C", "(", "=", "O", ")", "N", "c", "1", "c", "c", "c",
        "(", "O", ")", "c", "c", "1",
    ]


def test_two_char_and_bracket_atoms():
    t = SmilesTokenizer()
    assert t("BrCCl") == ["Br", "C", "Cl"]
    assert t("[nH]") == ["[nH]"]
    assert t("C[N+](C)(C)C") == ["C", "[N+]", "(", "C", ")", "(", "C", ")", "C"]
    assert t("[13CH4]") == ["[13CH4]"]


def test_ring_percent_and_punct():
    t = SmilesTokenizer()
    assert t("C%12CC%12") == ["C", "%12", "C", "C", "%12"]
    assert t("C/C=C\\C") == ["C", "/", "C", "=", "C", "\\", "C"]
    assert t("C.C") == ["C", ".", "C"]


def test_sep_tokenizer():
    t = SmilesTokenizer(add_sep=True)
    assert t("c1ccccc1<sep>CCO") == [
        "c", "1", "c", "c", "c", "c", "c", "1", "<sep>", "C", "C", "O"]
    assert t("CCO") == ["C", "C", "O"]
    # malformed: two separators -> empty (reference behavior)
    assert t("C<sep>C<sep>C") == []


def test_roundtrip_untokenize():
    t = SmilesTokenizer()
    smi = "CC(=O)Nc1ccc(O)cc1"
    toks = t(smi)
    trg = Vocab.from_corpus_tokens([toks], with_sos_eos=True, add_sep=False)
    ids = [trg.sos_id] + trg.encode(toks) + [trg.eos_id]
    assert untokenize(ids, trg.sos_id, trg.eos_id, trg.itos) == smi


def test_vocab_special_order():
    toks = [["C", "C", "O"], ["c", "1", "C"]]
    src, trg = build_vocab_pair(toks, toks, add_sep=False)
    assert src.itos[:2] == ["<unk>", "<pad>"]
    assert trg.itos[:4] == ["<unk>", "<pad>", "<sos>", "<eos>"]
    src_s, trg_s = build_vocab_pair(toks, toks, add_sep=True)
    assert src_s.itos[:3] == ["<unk>", "<pad>", "<sep>"]
    assert trg_s.itos[:5] == ["<unk>", "<pad>", "<sos>", "<eos>", "<sep>"]
    # frequency order with alphabetical tie-break: C(3) then O,c,1 (1 each)
    assert trg.itos[4] == "C"
    assert trg.itos[5:8] == sorted(["O", "c", "1"])


def test_vocab_roundtrip_save(tmp_path):
    v = Vocab.from_corpus_tokens([["C", "O"]], with_sos_eos=True, add_sep=True)
    p = tmp_path / "v.json"
    v.save(str(p))
    v2 = Vocab.load(str(p))
    assert v2.itos == v.itos and v2.stoi == v.stoi
