// Native lexical-index builder: whitespace tokenization, vocabulary
// construction, document frequencies, and Okapi BM25 per-(doc, term)
// contribution precompute into padded-ELL arrays.
//
// This is the host-side hot loop of lexical index construction (the
// reference delegates it to rank_bm25's Python/NumPy build —
// reference: src/retrieval.py:62-71); at 1M+ chunks the pure-Python
// Counter pipeline dominates build time, so it runs here as a C ABI
// library loaded via ctypes (persian_rag_tpu.native). Scoring itself
// runs on the TPU (persian_rag_tpu.ops.sparse_scores).
//
// Contract notes:
// * Tokens are byte-exact whitespace splits of the UTF-8 input
//   (Python str.split() semantics over ASCII whitespace + the
//   reference's normalizer guarantees collapsed spaces).
// * Vocabulary ids are assigned in first-occurrence order over the
//   corpus scan, matching the Python builder, so ELL arrays are
//   bit-identical between backends.
// * BM25 math matches rank_bm25.BM25Okapi: raw idf
//   ln((N-df+0.5)/(df+0.5)); negative idfs replaced by
//   epsilon * mean(raw idf); contribution
//   idf * tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl)).
//
// Build: g++ -O2 -shared -fPIC -std=c++17 lexical_native.cpp -o liblexical.so

#include <cstdint>
#include <cmath>
#include <cstring>
#include <string>
#include <string_view>
#include <unordered_map>
#include <vector>

namespace {

struct DocEntry {
  int32_t term_id;
  float value;
};

struct Bm25Handle {
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::string> terms;              // id -> term
  std::vector<std::vector<DocEntry>> per_doc;  // ELL rows (ragged)
  std::vector<double> idf;                     // per term id
  int64_t ell_width = 0;
  double avgdl = 0.0;
  double k1 = 1.5, b = 0.75, epsilon = 0.25;
};

inline bool is_space(char c) {
  return c == ' ' || c == '\t' || c == '\n' || c == '\r' || c == '\f' ||
         c == '\v';
}

// Split [begin, end) on ASCII whitespace, invoking fn(token_view).
template <typename Fn>
void for_each_token(const char* begin, const char* end, Fn fn) {
  const char* p = begin;
  while (p < end) {
    while (p < end && is_space(*p)) ++p;
    const char* start = p;
    while (p < end && !is_space(*p)) ++p;
    if (p > start) fn(std::string_view(start, p - start));
  }
}

}  // namespace

extern "C" {

// Build a BM25 index over n_docs documents packed into one UTF-8 buffer.
// doc_offsets has n_docs+1 entries (byte offsets into buffer).
void* bm25_build(const char* buffer, const int64_t* doc_offsets,
                 int64_t n_docs, double k1, double b, double epsilon) {
  auto* h = new Bm25Handle();
  h->k1 = k1;
  h->b = b;
  h->epsilon = epsilon;
  h->per_doc.resize(n_docs);

  std::vector<int64_t> doc_lens(n_docs, 0);
  std::vector<int64_t> doc_freq;  // per term id
  // per-doc term counts, reusing a scratch map keyed by term id
  std::unordered_map<int32_t, int32_t> tf_scratch;
  int64_t total_len = 0;

  std::vector<std::vector<std::pair<int32_t, int32_t>>> doc_tfs(n_docs);

  for (int64_t d = 0; d < n_docs; ++d) {
    const char* begin = buffer + doc_offsets[d];
    const char* end = buffer + doc_offsets[d + 1];
    tf_scratch.clear();
    std::vector<int32_t> order;  // first-occurrence order of term ids
    for_each_token(begin, end, [&](std::string_view tok) {
      ++doc_lens[d];
      auto it = h->vocab.find(std::string(tok));
      int32_t id;
      if (it == h->vocab.end()) {
        id = static_cast<int32_t>(h->terms.size());
        h->vocab.emplace(std::string(tok), id);
        h->terms.emplace_back(tok);
        doc_freq.push_back(0);
      } else {
        id = it->second;
      }
      auto [tf_it, inserted] = tf_scratch.try_emplace(id, 0);
      if (inserted) order.push_back(id);
      ++tf_it->second;
    });
    total_len += doc_lens[d];
    auto& tfs = doc_tfs[d];
    tfs.reserve(order.size());
    for (int32_t id : order) {
      tfs.emplace_back(id, tf_scratch[id]);
      ++doc_freq[id];
    }
    if (static_cast<int64_t>(order.size()) > h->ell_width)
      h->ell_width = static_cast<int64_t>(order.size());
  }
  if (h->ell_width == 0) h->ell_width = 1;
  h->avgdl = n_docs ? static_cast<double>(total_len) / n_docs : 0.0;

  // idf with rank_bm25's negative-idf epsilon floor
  const int64_t v = static_cast<int64_t>(h->terms.size());
  h->idf.resize(v);
  double idf_sum = 0.0;
  std::vector<int32_t> negative;
  for (int64_t t = 0; t < v; ++t) {
    double idf =
        std::log(n_docs - doc_freq[t] + 0.5) - std::log(doc_freq[t] + 0.5);
    h->idf[t] = idf;
    idf_sum += idf;
    if (idf < 0) negative.push_back(static_cast<int32_t>(t));
  }
  double eps = v ? epsilon * (idf_sum / v) : 0.0;
  for (int32_t t : negative) h->idf[t] = eps;

  // precompute per-(doc, term) contributions
  for (int64_t d = 0; d < n_docs; ++d) {
    double denom_norm =
        k1 * (1.0 - b + b * doc_lens[d] / (h->avgdl > 0 ? h->avgdl : 1e-12));
    auto& row = h->per_doc[d];
    row.reserve(doc_tfs[d].size());
    for (auto [id, tf] : doc_tfs[d]) {
      double contrib = h->idf[id] * tf * (k1 + 1.0) / (tf + denom_norm);
      row.push_back({id, static_cast<float>(contrib)});
    }
  }
  return h;
}

int64_t bm25_ell_width(void* handle) {
  return static_cast<Bm25Handle*>(handle)->ell_width;
}

int64_t bm25_vocab_size(void* handle) {
  return static_cast<int64_t>(static_cast<Bm25Handle*>(handle)->terms.size());
}

double bm25_avgdl(void* handle) {
  return static_cast<Bm25Handle*>(handle)->avgdl;
}

// Fill caller-allocated (n_docs x ell_width) arrays; ids padded with -1,
// vals with 0.
void bm25_fill_ell(void* handle, int32_t* ids_out, float* vals_out) {
  auto* h = static_cast<Bm25Handle*>(handle);
  const int64_t L = h->ell_width;
  for (size_t d = 0; d < h->per_doc.size(); ++d) {
    int32_t* ids = ids_out + d * L;
    float* vals = vals_out + d * L;
    int64_t i = 0;
    for (const auto& e : h->per_doc[d]) {
      ids[i] = e.term_id;
      vals[i] = e.value;
      ++i;
    }
    for (; i < L; ++i) {
      ids[i] = -1;
      vals[i] = 0.0f;
    }
  }
}

// Total bytes of all vocabulary terms concatenated (for export).
int64_t bm25_vocab_bytes(void* handle) {
  auto* h = static_cast<Bm25Handle*>(handle);
  int64_t total = 0;
  for (const auto& t : h->terms) total += static_cast<int64_t>(t.size());
  return total;
}

// Export vocab as a concatenated UTF-8 buffer + (vocab_size+1) offsets;
// term id == position.
void bm25_export_vocab(void* handle, char* buf_out, int64_t* offsets_out) {
  auto* h = static_cast<Bm25Handle*>(handle);
  int64_t pos = 0;
  int64_t i = 0;
  for (const auto& t : h->terms) {
    offsets_out[i++] = pos;
    std::memcpy(buf_out + pos, t.data(), t.size());
    pos += static_cast<int64_t>(t.size());
  }
  offsets_out[i] = pos;
}

// Export per-term idf values (after the epsilon floor).
void bm25_export_idf(void* handle, double* idf_out) {
  auto* h = static_cast<Bm25Handle*>(handle);
  std::memcpy(idf_out, h->idf.data(), h->idf.size() * sizeof(double));
}

// Map query tokens (packed buffer + offsets) to term ids; -1 for OOV.
void bm25_lookup(void* handle, const char* buffer, const int64_t* offsets,
                 int64_t n_tokens, int32_t* ids_out) {
  auto* h = static_cast<Bm25Handle*>(handle);
  for (int64_t i = 0; i < n_tokens; ++i) {
    std::string tok(buffer + offsets[i], offsets[i + 1] - offsets[i]);
    auto it = h->vocab.find(tok);
    ids_out[i] = it == h->vocab.end() ? -1 : it->second;
  }
}

void bm25_free(void* handle) { delete static_cast<Bm25Handle*>(handle); }

}  // extern "C"
