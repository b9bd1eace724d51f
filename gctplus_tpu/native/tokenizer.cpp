// Native SMILES tokenizer + vocab encoder (data-loader hot path).
//
// The reference's tokenize/encode path is Python regex + torchtext
// Field.process per batch (Utils/field.py:8-43, Model/collate_fn.py);
// at MOSES scale (1.58M molecules x epochs x augmentation) that is a
// host-side bottleneck. This hand-rolled scanner implements the exact
// same token grammar (bracket atoms, Br/Cl, organic subset,
// punctuation, %NN, ring digits, <sep>) and encodes straight into a
// caller-provided int32 buffer, padded, with optional <sos>/<eos>.
//
// C ABI, consumed via ctypes (gctplus_tpu/native/__init__.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> stoi;
    int32_t unk = 0;
    int32_t sep = -1;
};

inline bool is_org_upper(char c) {
    // N O S P F I B C (Br/Cl handled separately)
    return c == 'N' || c == 'O' || c == 'S' || c == 'P' || c == 'F' ||
           c == 'I' || c == 'B' || c == 'C';
}

inline bool is_aromatic(char c) {
    return c == 'b' || c == 'c' || c == 'n' || c == 'o' || c == 's' ||
           c == 'p';
}

inline bool is_punct(char c) {
    return c == '(' || c == ')' || c == '.' || c == '=' || c == '#' ||
           c == '-' || c == '+' || c == '\\' || c == '/' || c == ':' ||
           c == '~' || c == '@' || c == '?' || c == '>' || c == '*' ||
           c == '$';
}

// scan one token starting at s[i]; returns token length (0 = skip char)
// mirrors SMILES_TOKEN_PATTERN (gctplus_tpu/chem/tokenizer.py)
inline size_t scan_token(const char* s, size_t i, size_t n) {
    char c = s[i];
    if (c == '[') {
        size_t j = i + 1;
        while (j < n && s[j] != ']') ++j;
        if (j < n) return j - i + 1;
        return 0;  // unclosed bracket: drop (regex behavior)
    }
    if (c == 'B') {
        if (i + 1 < n && s[i + 1] == 'r') return 2;
        return 1;
    }
    if (c == 'C') {
        if (i + 1 < n && s[i + 1] == 'l') return 2;
        return 1;
    }
    if (is_org_upper(c) || is_aromatic(c) || is_punct(c)) return 1;
    if (c == '%') {
        if (i + 2 < n && s[i + 1] >= '0' && s[i + 1] <= '9' &&
            s[i + 2] >= '0' && s[i + 2] <= '9')
            return 3;
        return 0;
    }
    if (c >= '0' && c <= '9') return 1;
    return 0;  // unknown char: dropped, like re.findall
}

}  // namespace

extern "C" {

void* gct_vocab_new(const char** tokens, int32_t n, int32_t unk_id,
                    int32_t sep_id) {
    auto* v = new Vocab();
    for (int32_t i = 0; i < n; ++i) v->stoi.emplace(tokens[i], i);
    v->unk = unk_id;
    v->sep = sep_id;
    return v;
}

void gct_vocab_free(void* handle) { delete static_cast<Vocab*>(handle); }

// Tokenize+encode a batch. out: (n, max_len) int32 pre-filled by caller
// with pad_id. lengths: (n,) int32 receives emitted length (clipped).
// add_sos/add_eos: prepend/append ids (<0 disables). handle_sep: split
// on "<sep>" like the _sep tokenizers.
void gct_encode_batch(void* handle, const char** smiles, int32_t n,
                      int32_t* out, int32_t max_len, int32_t* lengths,
                      int32_t add_sos, int32_t add_eos,
                      int32_t handle_sep) {
    auto* v = static_cast<Vocab*>(handle);
    std::string tok;
    for (int32_t r = 0; r < n; ++r) {
        const char* s = smiles[r];
        size_t len = std::strlen(s);
        int32_t* row = out + static_cast<size_t>(r) * max_len;
        int32_t w = 0;
        if (add_sos >= 0 && w < max_len) row[w++] = add_sos;
        size_t i = 0;
        while (i < len && w < max_len) {
            if (handle_sep && s[i] == '<' && i + 5 <= len &&
                std::strncmp(s + i, "<sep>", 5) == 0) {
                row[w++] = v->sep >= 0 ? v->sep : v->unk;
                i += 5;
                continue;
            }
            size_t tl = scan_token(s, i, len);
            if (tl == 0) { ++i; continue; }
            tok.assign(s + i, tl);
            auto it = v->stoi.find(tok);
            row[w++] = (it == v->stoi.end()) ? v->unk : it->second;
            i += tl;
        }
        if (add_eos >= 0 && w < max_len) row[w++] = add_eos;
        lengths[r] = w;
    }
}

// token count only (for histogram/toklen work), no vocab needed
void gct_count_tokens(const char** smiles, int32_t n, int32_t* counts,
                      int32_t handle_sep) {
    for (int32_t r = 0; r < n; ++r) {
        const char* s = smiles[r];
        size_t len = std::strlen(s);
        int32_t c = 0;
        size_t i = 0;
        while (i < len) {
            if (handle_sep && s[i] == '<' && i + 5 <= len &&
                std::strncmp(s + i, "<sep>", 5) == 0) {
                ++c; i += 5; continue;
            }
            size_t tl = scan_token(s, i, len);
            if (tl == 0) { ++i; continue; }
            ++c; i += tl;
        }
        counts[r] = c;
    }
}

}  // extern "C"
