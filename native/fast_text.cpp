// Native host-side text pipeline for matchmaker_tpu.
//
// Role: the reference leans on BlingFire (C++) for word tokenization
// (dataloaders/bling_fire_tokenizer.py:6-12) and AllenNLP worker processes for
// TSV parsing. This library is the TPU build's native equivalent: a
// zero-dependency C core that tokenizes text (lowercased word/punct splits,
// matching matchmaker_tpu.data.tokenization.WhitespaceTokenizer), looks up a
// vocabulary, and fills fixed-shape int32/float32 batch buffers directly —
// called from Python via ctypes with no per-token Python objects.
//
// Build: make -C native   (produces libmmfast.so)

#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr int32_t kPadId = 0;
constexpr int32_t kOovId = 1;

struct Vocab {
  std::unordered_map<std::string, int32_t> token_to_id;
};

// lowercased word/punctuation tokenization: [A-Za-z0-9]+ runs or single
// non-space symbols (mirrors _WORD_RE in data/tokenization.py).
inline void tokenize(const char* text, size_t len, std::vector<std::string>* out) {
  out->clear();
  std::string current;
  for (size_t i = 0; i < len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (std::isalnum(c)) {
      current.push_back(static_cast<char>(std::tolower(c)));
    } else {
      if (!current.empty()) {
        out->push_back(current);
        current.clear();
      }
      if (!std::isspace(c)) {
        out->push_back(std::string(1, static_cast<char>(c)));
      }
    }
  }
  if (!current.empty()) out->push_back(current);
}

struct TripleReader {
  std::ifstream stream;
};

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// vocabulary
// ---------------------------------------------------------------------------

void* mm_vocab_load(const char* path) {
  auto* vocab = new Vocab();
  vocab->token_to_id.reserve(1 << 20);
  std::ifstream f(path);
  if (!f.is_open()) {
    delete vocab;
    return nullptr;
  }
  std::string line;
  int32_t next_id = 2;  // 0 = PAD, 1 = OOV
  while (std::getline(f, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    if (vocab->token_to_id.emplace(line, next_id).second) ++next_id;
  }
  return vocab;
}

int32_t mm_vocab_size(void* handle) {
  return static_cast<int32_t>(static_cast<Vocab*>(handle)->token_to_id.size()) + 2;
}

void mm_vocab_free(void* handle) { delete static_cast<Vocab*>(handle); }

// ---------------------------------------------------------------------------
// batch tokenization: texts are '\n'-joined; output buffers are
// (n_texts, max_len) row-major int32 / float32, pre-allocated by the caller.
// ---------------------------------------------------------------------------

void mm_tokenize_batch(void* vocab_handle, const char* joined_texts, int32_t n_texts,
                       int32_t max_len, int32_t mask_oov, int32_t* out_ids,
                       float* out_mask) {
  auto* vocab = static_cast<Vocab*>(vocab_handle);
  const char* p = joined_texts;
  std::vector<std::string> tokens;
  for (int32_t t = 0; t < n_texts; ++t) {
    const char* end = std::strchr(p, '\n');
    size_t len = end ? static_cast<size_t>(end - p) : std::strlen(p);
    tokenize(p, len, &tokens);
    int32_t* ids_row = out_ids + static_cast<size_t>(t) * max_len;
    float* mask_row = out_mask + static_cast<size_t>(t) * max_len;
    int32_t n = static_cast<int32_t>(tokens.size());
    if (n > max_len) n = max_len;
    for (int32_t i = 0; i < n; ++i) {
      auto it = vocab->token_to_id.find(tokens[i]);
      int32_t id = (it == vocab->token_to_id.end()) ? kOovId : it->second;
      ids_row[i] = id;
      mask_row[i] = (mask_oov && id == kOovId) ? 0.0f : 1.0f;
    }
    for (int32_t i = n; i < max_len; ++i) {
      ids_row[i] = kPadId;
      mask_row[i] = 0.0f;
    }
    p = end ? end + 1 : p + len;
  }
}

// hash-vocab variant (crc32-compatible with data/tokenization.HashBertTokenizer)
static uint32_t crc32_table[256];
static bool crc32_ready = false;
static void crc32_init() {
  for (uint32_t i = 0; i < 256; ++i) {
    uint32_t c = i;
    for (int k = 0; k < 8; ++k) c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc32_table[i] = c;
  }
  crc32_ready = true;
}
static uint32_t crc32(const std::string& s) {
  if (!crc32_ready) crc32_init();
  uint32_t c = 0xFFFFFFFFu;
  for (unsigned char ch : s) c = crc32_table[(c ^ ch) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

void mm_hash_tokenize_batch(const char* joined_texts, int32_t n_texts, int32_t max_len,
                            int32_t vocab_size, int32_t reserved, int32_t cls_id,
                            int32_t sep_id, int32_t* out_ids, float* out_mask) {
  const char* p = joined_texts;
  std::vector<std::string> tokens;
  for (int32_t t = 0; t < n_texts; ++t) {
    const char* end = std::strchr(p, '\n');
    size_t len = end ? static_cast<size_t>(end - p) : std::strlen(p);
    tokenize(p, len, &tokens);
    int32_t* ids_row = out_ids + static_cast<size_t>(t) * max_len;
    float* mask_row = out_mask + static_cast<size_t>(t) * max_len;
    int32_t pos = 0;
    ids_row[pos++] = cls_id;
    int32_t n = static_cast<int32_t>(tokens.size());
    for (int32_t i = 0; i < n && pos < max_len - 1; ++i) {
      ids_row[pos++] = reserved + static_cast<int32_t>(crc32(tokens[i]) %
                                                       static_cast<uint32_t>(vocab_size - reserved));
    }
    ids_row[pos++] = sep_id;
    for (int32_t i = 0; i < pos; ++i) mask_row[i] = 1.0f;
    for (int32_t i = pos; i < max_len; ++i) {
      ids_row[i] = kPadId;
      mask_row[i] = 0.0f;
    }
    p = end ? end + 1 : p + len;
  }
}

// ---------------------------------------------------------------------------
// streaming triple reader: fills per-column text buffers for one batch.
// Returns rows read (0 at EOF). Columns are '\n'-joined into caller buffers.
// ---------------------------------------------------------------------------

void* mm_triples_open(const char* path) {
  auto* r = new TripleReader();
  r->stream.open(path);
  if (!r->stream.is_open()) {
    delete r;
    return nullptr;
  }
  return r;
}

int32_t mm_triples_next_batch(void* handle, int32_t batch_size, char* out_queries,
                              char* out_pos, char* out_neg, int32_t buf_cap) {
  auto* r = static_cast<TripleReader*>(handle);
  std::string line;
  int32_t rows = 0;
  size_t qo = 0, po = 0, no = 0;
  auto append = [&](char* buf, size_t* off, const std::string& s) -> bool {
    if (*off + s.size() + 2 >= static_cast<size_t>(buf_cap)) return false;
    std::memcpy(buf + *off, s.data(), s.size());
    *off += s.size();
    buf[(*off)++] = '\n';
    buf[*off] = '\0';
    return true;
  };
  while (rows < batch_size && std::getline(r->stream, line)) {
    if (!line.empty() && line.back() == '\r') line.pop_back();
    if (line.empty()) continue;
    size_t t1 = line.find('\t');
    if (t1 == std::string::npos) continue;
    size_t t2 = line.find('\t', t1 + 1);
    if (t2 == std::string::npos) continue;
    if (!append(out_queries, &qo, line.substr(0, t1))) break;
    if (!append(out_pos, &po, line.substr(t1 + 1, t2 - t1 - 1))) break;
    if (!append(out_neg, &no, line.substr(t2 + 1))) break;
    ++rows;
  }
  return rows;
}

void mm_triples_close(void* handle) { delete static_cast<TripleReader*>(handle); }

}  // extern "C"
