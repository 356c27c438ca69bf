// Native Criteo TSV parser/encoder for recommender_tpu.
//
// Replaces the tf.data/TFRecord C++ pipeline the reference leans on
// (SURVEY.md §2.7 item 5) for the offline encode of the 40M-row Criteo set:
// the Python reference (recommender_tpu/data/criteo.py::encode_lines) is the
// behavioural spec; this parser applies the same rules ~40× faster:
//   * ints: missing/negative → 0, then log(x+1)
//   * cats: missing → per-column sentinel "__miss_<col>__", value → vocab id,
//     OOV → 0
//
// Vocab exchange format: a single '\n'-joined blob of tokens whose vocab ids
// are 1..N in order (bucket 0 = OOV), as produced by criteo.save_vocab_blob.

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {
constexpr int kNumInt = 13;
constexpr int kNumCat = 26;

struct Vocab {
  std::unordered_map<std::string, int32_t> map;
};

std::string miss_token(int col) { return "__miss_" + std::to_string(col) + "__"; }
}  // namespace

extern "C" {

void* criteo_vocab_create(const char* blob, int64_t blob_len) {
  auto* v = new Vocab();
  std::string_view sv(blob, blob_len);
  int32_t id = 1;
  size_t start = 0;
  while (start < sv.size()) {
    size_t end = sv.find('\n', start);
    if (end == std::string_view::npos) end = sv.size();
    if (end > start) v->map.emplace(std::string(sv.substr(start, end - start)), id++);
    start = end + 1;
  }
  return v;
}

void criteo_vocab_destroy(void* vocab) { delete static_cast<Vocab*>(vocab); }

int64_t criteo_count_lines(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::vector<char> buf(1 << 20);
  int64_t lines = 0;
  size_t got;
  bool last_nl = true;
  while ((got = std::fread(buf.data(), 1, buf.size(), f)) > 0) {
    for (size_t i = 0; i < got; ++i) lines += (buf[i] == '\n');
    last_nl = buf[got - 1] == '\n';
  }
  std::fclose(f);
  return lines + (last_nl ? 0 : 1);
}

// Encode up to max_rows lines of a Criteo TSV. Returns rows written, or -1.
int64_t criteo_encode(const char* path, void* vocab_ptr, int64_t max_rows,
                      float* out_int, int32_t* out_cat, float* out_label) {
  const Vocab& vocab = *static_cast<Vocab*>(vocab_ptr);
  // per-column sentinel ids resolved once
  int32_t miss_id[kNumCat];
  for (int c = 0; c < kNumCat; ++c) {
    auto it = vocab.map.find(miss_token(c));
    miss_id[c] = it == vocab.map.end() ? 0 : it->second;
  }
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::string line;
  line.reserve(1024);
  std::vector<char> buf(1 << 20);
  int64_t row = 0;
  std::string key;
  auto process = [&](const std::string& ln) {
    if (row >= max_rows) return;
    const char* p = ln.c_str();
    const char* end = p + ln.size();
    // field 0: label
    float label = 0.f;
    if (p < end && *p != '\t') label = static_cast<float>(std::atoi(p));
    while (p < end && *p != '\t') ++p;
    if (p < end) ++p;
    // 13 int features
    for (int i = 0; i < kNumInt; ++i) {
      long v = 0;
      if (p < end && *p != '\t') {
        v = std::atol(p);
        if (v < 0) v = 0;
      }
      out_int[row * kNumInt + i] = std::log1p(static_cast<float>(v));
      while (p < end && *p != '\t') ++p;
      if (p < end) ++p;
    }
    // 26 categorical features
    for (int c = 0; c < kNumCat; ++c) {
      const char* s = p;
      while (p < end && *p != '\t') ++p;
      int32_t id;
      if (p == s) {
        id = miss_id[c];
      } else {
        key.assign(s, p - s);
        auto it = vocab.map.find(key);
        id = it == vocab.map.end() ? 0 : it->second;
      }
      out_cat[row * kNumCat + c] = id;
      if (p < end) ++p;
    }
    out_label[row] = label;
    ++row;
  };
  size_t got;
  while ((got = std::fread(buf.data(), 1, buf.size(), f)) > 0 && row < max_rows) {
    size_t start = 0;
    for (size_t i = 0; i < got; ++i) {
      if (buf[i] == '\n') {
        line.append(buf.data() + start, i - start);
        process(line);
        line.clear();
        start = i + 1;
      }
    }
    line.append(buf.data() + start, got - start);
  }
  if (!line.empty() && row < max_rows) process(line);
  std::fclose(f);
  return row;
}

}  // extern "C"
