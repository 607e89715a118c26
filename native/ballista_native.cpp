// Native host-side kernels for ballista_tpu ingest.
//
// Reference parity: the reference engine's ingest path is native Rust
// (DataFusion CSV/Parquet readers + Arrow arrays). Our device compute is
// XLA; the host-side columnar preparation that feeds it lives here.
//
// bt_dict_encode: sorted-dictionary-encode an Arrow string column given its
// raw (offsets, data) buffers. Replaces a numpy object-array searchsorted
// (Python-string comparisons) with string_view sorting — the dominant cost
// of table ingest at SF>=1.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <numeric>
#include <string_view>
#include <vector>

extern "C" {

// Encode n strings (Arrow layout: data bytes + n+1 int32 offsets) against
// their own sorted dictionary.
//   codes_out[n]       : dictionary code per row
//   dict_rows_out[<=n] : row index of the first occurrence of each distinct
//                        value, in sorted (lexicographic) order
// Returns the dictionary size (#distinct), or -1 on error.
int64_t bt_dict_encode(const uint8_t* data, const int32_t* offsets,
                       int64_t n, int32_t* codes_out,
                       int32_t* dict_rows_out) {
  if (n == 0) return 0;
  std::vector<std::string_view> views;
  views.reserve(n);
  for (int64_t i = 0; i < n; i++) {
    views.emplace_back(reinterpret_cast<const char*>(data) + offsets[i],
                       static_cast<size_t>(offsets[i + 1] - offsets[i]));
  }
  std::vector<int32_t> order(n);
  std::iota(order.begin(), order.end(), 0);
  std::sort(order.begin(), order.end(), [&](int32_t a, int32_t b) {
    return views[a] < views[b];
  });
  int64_t ndict = 0;
  for (int64_t i = 0; i < n; i++) {
    int32_t row = order[i];
    if (i == 0 || views[row] != views[order[i - 1]]) {
      dict_rows_out[ndict] = row;
      ndict++;
    }
    codes_out[row] = static_cast<int32_t>(ndict - 1);
  }
  return ndict;
}

// Encode n strings against a PRE-SORTED external dictionary given as
// (dict_data, dict_offsets, dict_n) — used when shards of one table must
// share codes. Unknown values get code -1. Returns 0.
int64_t bt_dict_encode_against(const uint8_t* data, const int32_t* offsets,
                               int64_t n, const uint8_t* dict_data,
                               const int32_t* dict_offsets, int64_t dict_n,
                               int32_t* codes_out) {
  std::vector<std::string_view> dict;
  dict.reserve(dict_n);
  for (int64_t i = 0; i < dict_n; i++) {
    dict.emplace_back(reinterpret_cast<const char*>(dict_data) + dict_offsets[i],
                      static_cast<size_t>(dict_offsets[i + 1] - dict_offsets[i]));
  }
  for (int64_t i = 0; i < n; i++) {
    std::string_view v(reinterpret_cast<const char*>(data) + offsets[i],
                       static_cast<size_t>(offsets[i + 1] - offsets[i]));
    auto it = std::lower_bound(dict.begin(), dict.end(), v);
    codes_out[i] =
        (it != dict.end() && *it == v)
            ? static_cast<int32_t>(it - dict.begin())
            : -1;
  }
  return 0;
}

}  // extern "C"
