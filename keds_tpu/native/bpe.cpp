// Native byte-pair-encoding core for the CLIP tokenizer.
//
// The reference tokenizes on the Python hot path (captions for every train
// batch, ~0.5M knowledge-DB templates, every eval prompt).  This C++ core
// implements the pretokenizer + greedy lowest-rank BPE merge loop for
// *cleaned, lowercased ASCII* input (the caller handles unicode via the
// Python fallback) — ASCII covers virtually all CC3M/CIRR text.
//
// Contract (mirrors keds_tpu/tokenizer.py, which mirrors the CLIP tokenizer):
//  * pretokens: contractions ('s 't 're 've 'm 'll 'd), letter runs, single
//    digits, runs of other non-space printable chars;
//  * per pretoken: chars with "</w>" appended to the last, merged greedily by
//    minimal merge rank, left to right;
//  * ids resolved against the standard 49408-entry vocab.
//
// Exposed as a C ABI for ctypes; one encoder instance per process.

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Encoder {
  std::unordered_map<std::string, int32_t> vocab;   // token -> id
  std::unordered_map<std::string, int32_t> ranks;   // "a\x01b" -> rank
  std::unordered_map<std::string, std::vector<int32_t>> cache;
};

Encoder *g_enc = nullptr;

inline bool is_letter(unsigned char c) { return (c >= 'a' && c <= 'z'); }
inline bool is_digit(unsigned char c) { return (c >= '0' && c <= '9'); }
inline bool is_space(unsigned char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' || c == '\v';
}

// Try to match a contraction at position i ("'s", "'t", "'re", ...).
inline int match_contraction(const std::string &s, size_t i) {
  if (s[i] != '\'' || i + 1 >= s.size()) return 0;
  char a = s[i + 1];
  if (a == 's' || a == 't' || a == 'm' || a == 'd') {
    // must not be followed by more letters (regex alternation tries the
    // contraction first, so "'ship" still matches "'s"; match greedily the
    // two-char form exactly like the reference pattern does)
    return 2;
  }
  if (i + 2 < s.size()) {
    char b = s[i + 2];
    if ((a == 'r' && b == 'e') || (a == 'v' && b == 'e') || (a == 'l' && b == 'l'))
      return 3;
  }
  return 0;
}

void merge_word(Encoder &enc, const std::string &token, std::vector<int32_t> &out) {
  auto cached = enc.cache.find(token);
  if (cached != enc.cache.end()) {
    out.insert(out.end(), cached->second.begin(), cached->second.end());
    return;
  }
  std::vector<std::string> parts;
  parts.reserve(token.size());
  for (size_t i = 0; i + 1 < token.size(); ++i) parts.emplace_back(1, token[i]);
  parts.push_back(std::string(1, token.back()) + "</w>");

  std::string key;
  while (parts.size() > 1) {
    int best_rank = INT32_MAX;
    size_t best_i = 0;
    for (size_t i = 0; i + 1 < parts.size(); ++i) {
      key.assign(parts[i]);
      key.push_back('\x01');
      key.append(parts[i + 1]);
      auto it = enc.ranks.find(key);
      if (it != enc.ranks.end() && it->second < best_rank) {
        best_rank = it->second;
        best_i = i;
      }
    }
    if (best_rank == INT32_MAX) break;
    const std::string first = parts[best_i];
    const std::string second = parts[best_i + 1];
    std::vector<std::string> merged;
    merged.reserve(parts.size());
    for (size_t i = 0; i < parts.size();) {
      if (i + 1 < parts.size() && parts[i] == first && parts[i + 1] == second) {
        merged.push_back(first + second);
        i += 2;
      } else {
        merged.push_back(parts[i]);
        i += 1;
      }
    }
    parts.swap(merged);
  }
  std::vector<int32_t> ids;
  ids.reserve(parts.size());
  for (const auto &p : parts) {
    auto it = enc.vocab.find(p);
    ids.push_back(it == enc.vocab.end() ? -1 : it->second);
  }
  enc.cache.emplace(token, ids);
  out.insert(out.end(), ids.begin(), ids.end());
}

void encode_one(Encoder &enc, const std::string &text, std::vector<int32_t> &out) {
  size_t i = 0;
  const size_t n = text.size();
  std::string tok;
  while (i < n) {
    unsigned char c = text[i];
    if (is_space(c)) { ++i; continue; }
    tok.clear();
    int cl = match_contraction(text, i);
    if (cl > 0) {
      tok = text.substr(i, cl);
      i += cl;
    } else if (is_letter(c)) {
      while (i < n && is_letter((unsigned char)text[i])) tok.push_back(text[i++]);
    } else if (is_digit(c)) {
      tok.push_back(text[i++]);  // single digit per pretoken
    } else {
      // Greedy punctuation run, exactly like the regex alternative
      // [^\s\p{L}\p{N}]+ — apostrophes inside the run are consumed by it
      // (contractions only win at a fresh match position).
      while (i < n) {
        unsigned char d = text[i];
        if (is_space(d) || is_letter(d) || is_digit(d)) break;
        tok.push_back(text[i++]);
      }
      if (tok.empty()) tok.push_back(text[i++]);
    }
    merge_word(enc, tok, out);
  }
}

}  // namespace

extern "C" {

// vocab_buf / merges_buf: '\n'-separated entries.  Merge pairs are
// space-separated ("a b").  Returns 0 on success.
int bpe_init(const char *vocab_buf, int64_t vocab_len,
             const char *merges_buf, int64_t merges_len) {
  delete g_enc;
  g_enc = new Encoder();
  {
    const char *p = vocab_buf, *end = vocab_buf + vocab_len;
    int32_t id = 0;
    while (p < end) {
      const char *nl = (const char *)memchr(p, '\n', end - p);
      if (!nl) nl = end;
      g_enc->vocab.emplace(std::string(p, nl - p), id++);
      p = nl + 1;
    }
  }
  {
    const char *p = merges_buf, *end = merges_buf + merges_len;
    int32_t rank = 0;
    while (p < end) {
      const char *nl = (const char *)memchr(p, '\n', end - p);
      if (!nl) nl = end;
      const char *sp = (const char *)memchr(p, ' ', nl - p);
      if (sp) {
        std::string key(p, sp - p);
        key.push_back('\x01');
        key.append(sp + 1, nl - sp - 1);
        g_enc->ranks.emplace(std::move(key), rank);
      }
      ++rank;
      p = nl + 1;
    }
  }
  return 0;
}

// texts: '\n'-separated cleaned lowercase ASCII strings.
// out_ids / out_offsets are caller-allocated; out_offsets has n_texts+1
// entries.  Returns total id count, or -1 if out_capacity is too small.
int64_t bpe_encode_batch(const char *texts, int64_t texts_len,
                         int32_t *out_ids, int64_t out_capacity,
                         int64_t *out_offsets, int64_t n_texts) {
  if (!g_enc) return -2;
  std::vector<int32_t> ids;
  ids.reserve(256);
  const char *p = texts, *end = texts + texts_len;
  int64_t t = 0, total = 0;
  out_offsets[0] = 0;
  while (p <= end && t < n_texts) {
    const char *nl = (const char *)memchr(p, '\n', end - p);
    if (!nl) nl = end;
    ids.clear();
    encode_one(*g_enc, std::string(p, nl - p), ids);
    if (total + (int64_t)ids.size() > out_capacity) return -1;
    memcpy(out_ids + total, ids.data(), ids.size() * sizeof(int32_t));
    total += ids.size();
    out_offsets[++t] = total;
    p = nl + 1;
  }
  return total;
}

void bpe_free() {
  delete g_enc;
  g_enc = nullptr;
}

}  // extern "C"
