// Native Stanford-PTB-style tokenizer — C++ twin of
// lrp_imagecaptioning_tpu/metrics/tokenizer.py (the pure-Python scanner that
// replaces the reference's Java subprocess, pycocoevalcap/tokenizer/
// ptbtokenizer.py:28-53).  SURVEY.md §2 calls for a self-contained C++ PTB
// tokenizer + native n-gram scorers so evaluation has no JVM dependency;
// CIDEr is already native (cider_scorer.cpp) — this closes the tokenizer
// half.  Loaded via ctypes (metrics/tokenizer.py), pure-Python fallback kept.
//
// Semantics replicated 1:1 with the Python module (same golden suite, plus a
// randomized cross-implementation property test in tests/test_ptb_golden.py):
//   - lowercase, unicode quote/dash normalization (PTB ptb3Escaping)
//   - token alternation IN ORDER: 'tis/'twas | ... | -- | acronym (x.y.) |
//     number (digit-led, [-.,]-joined) | word (letter-led, [-'.]-joined) |
//     single symbol
//   - bracket escapes emitted lowercase (-lrb-), reproducing the reference's
//     case-mismatch quirk that KEEPS them after punctuation removal
//   - clitic splitting (do n't, ca n't, should n't 've) + PTBLexer special
//     cases (y' all, 't is, 't was)
//   - the reference's punctuation-removal list
//
// Unicode model (documented approximation, same spirit as the Python regex's
// \w classes): codepoints are decoded from UTF-8; ASCII follows PTB rules;
// Latin-1 letters are lowercased and treated as letters; general-punctuation
// / currency / symbol blocks are symbols; all other non-space codepoints
// count as letters (the Python re module's unicode \w behaves the same for
// caption-corpus text).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------- utf-8 ----

// Decode UTF-8 into codepoints; invalid bytes pass through as Latin-1.
static void decode_utf8(const char* in, int64_t n, std::vector<uint32_t>& cps) {
  const unsigned char* s = reinterpret_cast<const unsigned char*>(in);
  int64_t i = 0;
  while (i < n) {
    unsigned char c = s[i];
    uint32_t cp;
    int len;
    if (c < 0x80) { cp = c; len = 1; }
    else if ((c >> 5) == 0x6 && i + 1 < n && (s[i+1] & 0xC0) == 0x80) {
      cp = ((c & 0x1F) << 6) | (s[i+1] & 0x3F); len = 2;
    } else if ((c >> 4) == 0xE && i + 2 < n && (s[i+1] & 0xC0) == 0x80 &&
               (s[i+2] & 0xC0) == 0x80) {
      cp = ((c & 0x0F) << 12) | ((s[i+1] & 0x3F) << 6) | (s[i+2] & 0x3F);
      len = 3;
    } else if ((c >> 3) == 0x1E && i + 3 < n && (s[i+1] & 0xC0) == 0x80 &&
               (s[i+2] & 0xC0) == 0x80 && (s[i+3] & 0xC0) == 0x80) {
      cp = ((c & 0x07) << 18) | ((s[i+1] & 0x3F) << 12) |
           ((s[i+2] & 0x3F) << 6) | (s[i+3] & 0x3F);
      len = 4;
    } else { cp = c; len = 1; }  // invalid: Latin-1 passthrough
    cps.push_back(cp);
    i += len;
  }
}

static void encode_utf8(uint32_t cp, std::string& out) {
  if (cp < 0x80) out += static_cast<char>(cp);
  else if (cp < 0x800) {
    out += static_cast<char>(0xC0 | (cp >> 6));
    out += static_cast<char>(0x80 | (cp & 0x3F));
  } else if (cp < 0x10000) {
    out += static_cast<char>(0xE0 | (cp >> 12));
    out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
    out += static_cast<char>(0x80 | (cp & 0x3F));
  } else {
    out += static_cast<char>(0xF0 | (cp >> 18));
    out += static_cast<char>(0x80 | ((cp >> 12) & 0x3F));
    out += static_cast<char>(0x80 | ((cp >> 6) & 0x3F));
    out += static_cast<char>(0x80 | (cp & 0x3F));
  }
}

// ------------------------------------------------------- classification ----

static bool is_space(uint32_t cp) {
  return cp == ' ' || cp == '\t' || cp == '\n' || cp == '\r' || cp == '\f' ||
         cp == '\v' || (cp >= 0x1C && cp <= 0x1F) || cp == 0x85 || cp == 0xA0 ||
         (cp >= 0x2000 && cp <= 0x200A) || cp == 0x2028 || cp == 0x2029 ||
         cp == 0x202F || cp == 0x205F || cp == 0x3000 || cp == 0x1680;
}

static bool is_digit(uint32_t cp) { return cp >= '0' && cp <= '9'; }

// Symbol/punctuation codepoint blocks (non-\w in the Python regex's terms).
static bool is_symbol_block(uint32_t cp) {
  if (cp < 0x80) return false;  // ASCII handled explicitly
  if (cp >= 0xA1 && cp <= 0xBF) {
    // Latin-1 codepoints Python's \w still counts as word chars: feminine/
    // masculine ordinals, micro sign, superscripts and vulgar fractions.
    switch (cp) {
      case 0xAA: case 0xBA: case 0xB2: case 0xB3: case 0xB5: case 0xB9:
      case 0xBC: case 0xBD: case 0xBE: return false;
      default: return true;
    }
  }
  if (cp == 0xD7 || cp == 0xF7) return true;              // multiply/divide
  if (cp >= 0x2010 && cp <= 0x206F) return true;          // general punct
  if (cp >= 0x20A0 && cp <= 0x20CF) return true;          // currency
  if (cp >= 0x2100 && cp <= 0x2BFF) return true;          // symbols/arrows
  if (cp >= 0x3001 && cp <= 0x303F) return true;          // CJK punct
  if (cp >= 0xFE30 && cp <= 0xFE4F) return true;
  if (cp >= 0xFF01 && cp <= 0xFF0F) return true;
  return false;
}

static bool is_word(uint32_t cp) {
  if (cp < 0x80)
    return (cp >= 'a' && cp <= 'z') || (cp >= 'A' && cp <= 'Z') ||
           (cp >= '0' && cp <= '9') || cp == '_';
  return !is_space(cp) && !is_symbol_block(cp);
}

static bool is_letter(uint32_t cp) {  // [^\W\d_]
  return is_word(cp) && !is_digit(cp) && cp != '_';
}

static uint32_t to_lower(uint32_t cp) {
  if (cp >= 'A' && cp <= 'Z') return cp + 0x20;
  if (cp >= 0xC0 && cp <= 0xDE && cp != 0xD7) return cp + 0x20;  // Latin-1
  return cp;
}

// ----------------------------------------------------------- normalize ----

// .lower() + '\n'->' ' + PTB unicode normalization (tokenizer.py
// _UNICODE_NORM): curly quotes -> ascii, en/em dash -> " -- ".
static void normalize(const std::vector<uint32_t>& in,
                      std::vector<uint32_t>& out) {
  out.reserve(in.size() + 8);
  for (uint32_t cp : in) {
    cp = to_lower(cp);
    switch (cp) {
      case '\n': out.push_back(' '); break;
      case 0x2019: case 0x2018: out.push_back('\''); break;
      case 0x201C: case 0x201D: out.push_back('"'); break;
      case 0x2013: case 0x2014:
        out.push_back(' '); out.push_back('-'); out.push_back('-');
        out.push_back(' ');
        break;
      default: out.push_back(cp);
    }
  }
}

// ------------------------------------------------------------- scanner ----

// One token as a [start, end) codepoint span of the normalized text.
struct Span { size_t a, b; };

static bool starts_with(const std::vector<uint32_t>& s, size_t i,
                        const char* lit) {
  for (const char* p = lit; *p; ++p, ++i)
    if (i >= s.size() || s[i] != static_cast<uint32_t>(*p)) return false;
  return true;
}

// The _TOKEN_RE alternation, first match wins (NOT longest).
static bool next_token(const std::vector<uint32_t>& s, size_t i, Span& tok) {
  const size_t n = s.size();
  // 't(is|was)\b
  if (starts_with(s, i, "'tis") && (i + 4 >= n || !is_word(s[i + 4]))) {
    tok = {i, i + 4}; return true;
  }
  if (starts_with(s, i, "'twas") && (i + 5 >= n || !is_word(s[i + 5]))) {
    tok = {i, i + 5}; return true;
  }
  if (starts_with(s, i, "...")) { tok = {i, i + 3}; return true; }
  if (starts_with(s, i, "--")) { tok = {i, i + 2}; return true; }
  // acronym: ([^\W\d_]\.){2,}
  {
    size_t j = i, pairs = 0;
    while (j + 1 < n && is_letter(s[j]) && s[j + 1] == '.') { j += 2; ++pairs; }
    if (pairs >= 2) { tok = {i, j}; return true; }
  }
  // number: \d[\w]*(?:[-.,][\w]+)*
  if (is_digit(s[i])) {
    size_t j = i + 1;
    while (j < n && is_word(s[j])) ++j;
    while (j + 1 < n && (s[j] == '-' || s[j] == '.' || s[j] == ',') &&
           is_word(s[j + 1])) {
      j += 2;
      while (j < n && is_word(s[j])) ++j;
    }
    tok = {i, j}; return true;
  }
  // word: [^\W\d_][\w]*(?:[-'.][\w]+)*
  if (is_letter(s[i])) {
    size_t j = i + 1;
    while (j < n && is_word(s[j])) ++j;
    while (j + 1 < n && (s[j] == '-' || s[j] == '\'' || s[j] == '.') &&
           is_word(s[j + 1])) {
      j += 2;
      while (j < n && is_word(s[j])) ++j;
    }
    tok = {i, j}; return true;
  }
  // single symbol: [^\w\s]
  if (!is_word(s[i]) && !is_space(s[i])) { tok = {i, i + 1}; return true; }
  return false;
}

// ------------------------------------------------- token postprocessing ----

// ptb3Escaping bracket escapes, emitted LOWERCASE (reference quirk keeps
// -lrb- after removal; '"' maps to the PTB quote escape which IS removed).
static const char* bracket_escape(const std::string& t) {
  if (t.size() != 1) return nullptr;
  switch (t[0]) {
    case '(': return "-lrb-"; case ')': return "-rrb-";
    case '{': return "-lcb-"; case '}': return "-rcb-";
    case '[': return "-lsb-"; case ']': return "-rsb-";
    case '"': return "''";
    default: return nullptr;
  }
}

static bool is_removed_punct(const std::string& t) {
  // The reference's removal list (ptbtokenizer.py:21-22) minus the uppercase
  // -LRB- family, which can never match lowercased tokens (the quirk).
  static const char* kPunct[] = {"''", "'", "``", "`", ".", "?", "!", ",",
                                 ":", "-", "--", "...", ";"};
  for (const char* p : kPunct)
    if (t == p) return true;
  return false;
}

// _ptb_word: PTBLexer special cases + recursive trailing-clitic split.
static void split_clitics(const std::string& t, std::vector<std::string>& out) {
  if (t == "y'all") { out.push_back("y'"); out.push_back("all"); return; }
  if (t == "'tis") { out.push_back("'t"); out.push_back("is"); return; }
  if (t == "'twas") { out.push_back("'t"); out.push_back("was"); return; }
  static const char* kClitics[] = {"'ll", "'re", "'ve", "n't", "'s", "'m", "'d"};
  for (const char* c : kClitics) {
    size_t cl = std::strlen(c);
    if (t.size() > cl && t.compare(t.size() - cl, cl, c) == 0) {
      split_clitics(t.substr(0, t.size() - cl), out);
      out.push_back(c);
      return;
    }
  }
  out.push_back(t);
}

static std::string tokenize_sentence(const char* in, int64_t n) {
  std::vector<uint32_t> raw, s;
  decode_utf8(in, n, raw);
  normalize(raw, s);
  std::string out;
  size_t i = 0;
  while (i < s.size()) {
    Span sp;
    if (!next_token(s, i, sp)) { ++i; continue; }
    i = sp.b;
    std::string tok;
    for (size_t k = sp.a; k < sp.b; ++k) encode_utf8(s[k], tok);
    if (const char* esc = bracket_escape(tok)) tok = esc;
    std::vector<std::string> parts;
    split_clitics(tok, parts);
    for (const std::string& p : parts) {
      if (is_removed_punct(p)) continue;
      if (!out.empty()) out += ' ';
      out += p;
    }
  }
  return out;
}

}  // namespace

extern "C" {

// Tokenize one UTF-8 sentence.  Writes up to `cap` bytes into `out` and
// returns the full result length in bytes (no NUL); if the return value
// exceeds `cap`, the caller must retry with a larger buffer.
int64_t ptb_tokenize_sentence_c(const char* in, int64_t in_len, char* out,
                                int64_t cap) {
  std::string res = tokenize_sentence(in, in_len);
  int64_t need = static_cast<int64_t>(res.size());
  if (out && cap > 0)
    std::memcpy(out, res.data(), static_cast<size_t>(std::min(need, cap)));
  return need;
}

}  // extern "C"
