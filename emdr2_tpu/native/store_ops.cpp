// Host-side hot loops for the token store and retrieval postprocess.
//
// The reference's equivalents are Python loops on the critical path:
// per-hit token fetch + format in get_topk/postprocess
// (/root/reference/megatron/model/emdr2_model.py:250-303,457-468) and the
// per-row evidence formatting in the index builder
// (megatron/data/orqa_wiki_dataset.py:85-120). These run every training
// step (B*K = 400 rows) and for all 21M rows per index refresh, so they get
// a native implementation here (the reference's native code budget went to
// CUDA softmax kernels instead; on TPU those are XLA-fused, and the host
// pipeline is what's left to accelerate).
//
// Exposed via ctypes (no pybind11 in this image): plain C ABI, raw pointers
// into numpy/memmap buffers. All token outputs are int32.

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// ---- batched padded gather -------------------------------------------------
// out[r, :] = tokens(indices[r]) truncated/padded to max_len.
// bin: the raw .bin mmap; pointers/sizes: per-sequence byte offsets and
// token counts from the .idx header (MMapIndexedDataset layout).

#define DEFINE_GATHER(NAME, SRC_T)                                         \
  void NAME(const uint8_t* bin, const int64_t* pointers,                   \
            const int32_t* sizes, const int64_t* indices, int64_t n_rows,  \
            int64_t max_len, int32_t pad_id, int32_t* out) {               \
    for (int64_t r = 0; r < n_rows; ++r) {                                 \
      const int64_t idx = indices[r];                                      \
      const SRC_T* src =                                                   \
          reinterpret_cast<const SRC_T*>(bin + pointers[idx]);             \
      const int64_t n = std::min<int64_t>(sizes[idx], max_len);            \
      int32_t* dst = out + r * max_len;                                    \
      for (int64_t i = 0; i < n; ++i) dst[i] = (int32_t)src[i];            \
      for (int64_t i = n; i < max_len; ++i) dst[i] = pad_id;               \
    }                                                                      \
  }

DEFINE_GATHER(gather_padded_u8, uint8_t)
DEFINE_GATHER(gather_padded_i8, int8_t)
DEFINE_GATHER(gather_padded_i16, int16_t)
DEFINE_GATHER(gather_padded_u16, uint16_t)
DEFINE_GATHER(gather_padded_i32, int32_t)
DEFINE_GATHER(gather_padded_i64, int64_t)

// ---- evidence row formatting ------------------------------------------------
// For each doc id d (1-based): emit
//   [CLS] title(d) [SEP] text(d) ... [SEP] pad...   (ids)
//   0 ... 0 pad_id...                               (tokentypes)
// exactly as context_bert_format over title+[SEP]+text
// (orqa_wiki_dataset.py:68-120): content capped at max_len-1 then [SEP].
// title/text stores may have different dtypes; handled by the uint16/int32
// dispatch below (only combinations used in practice).

}  // extern "C" (template below needs C++ linkage)

template <typename TT, typename DT>
static inline void format_one(const uint8_t* title_bin, int64_t t_ptr,
                              int32_t t_size, const uint8_t* text_bin,
                              int64_t d_ptr, int32_t d_size, int64_t max_len,
                              int32_t cls_id, int32_t sep_id, int32_t pad_id,
                              int32_t* ids, int32_t* types) {
  const TT* title = reinterpret_cast<const TT*>(title_bin + t_ptr);
  const DT* text = reinterpret_cast<const DT*>(text_bin + d_ptr);
  int64_t w = 0;
  ids[w++] = cls_id;
  for (int32_t i = 0; i < t_size && w < max_len - 1; ++i)
    ids[w++] = (int32_t)title[i];
  if (w < max_len - 1) ids[w++] = sep_id;
  for (int32_t i = 0; i < d_size && w < max_len - 1; ++i)
    ids[w++] = (int32_t)text[i];
  ids[w++] = sep_id;
  for (int64_t i = 0; i < w; ++i) types[i] = 0;
  for (int64_t i = w; i < max_len; ++i) {
    ids[i] = pad_id;
    types[i] = pad_id;
  }
}

extern "C" {

#define DEFINE_FORMAT(NAME, TT, DT)                                          \
  void NAME(const uint8_t* title_bin, const int64_t* title_ptrs,             \
            const int32_t* title_sizes, const uint8_t* text_bin,             \
            const int64_t* text_ptrs, const int32_t* text_sizes,             \
            const int64_t* doc_ids, int64_t n_rows, int64_t max_len,         \
            int32_t cls_id, int32_t sep_id, int32_t pad_id, int32_t* ids,    \
            int32_t* types) {                                                \
    for (int64_t r = 0; r < n_rows; ++r) {                                   \
      const int64_t row = doc_ids[r] - 1; /* 1-based doc ids */              \
      format_one<TT, DT>(title_bin, title_ptrs[row], title_sizes[row],       \
                         text_bin, text_ptrs[row], text_sizes[row], max_len, \
                         cls_id, sep_id, pad_id, ids + r * max_len,          \
                         types + r * max_len);                               \
    }                                                                        \
  }

DEFINE_FORMAT(format_context_u16_u16, uint16_t, uint16_t)
DEFINE_FORMAT(format_context_i32_i32, int32_t, int32_t)
DEFINE_FORMAT(format_context_u16_i32, uint16_t, int32_t)
DEFINE_FORMAT(format_context_i32_u16, int32_t, uint16_t)

}  // extern "C"
