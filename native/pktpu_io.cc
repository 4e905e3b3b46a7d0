// pocketkaldi_tpu native host runtime: IO + traceback hot paths.
//
// The TPU owns the compute path (JAX/XLA); this library owns the host-side
// runtime work that the reference implements in C++ (src/pcm_reader.cc,
// src/util.cc, the OLabel unwind in src/decoder.cc:304-339): strict WAV
// parsing, bulk FST loading, and the batched backpointer traceback.  Exposed
// as a plain C ABI for ctypes (no pybind11 in this image).
//
// Build: make -C native   → libpktpu_io.so

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

// ---------------------------------------------------------------------------
// WAV: strict 16 kHz mono PCM parser (behavioural spec: pcm_reader.cc:45-220)
// Returns number of samples on success (writing float32 into *out, malloc'd;
// caller frees via pktpu_free), or a negative error code:
//   -1 io, -2 header/corruption, -3 unsupported format
// ---------------------------------------------------------------------------

static int32_t rd_i32(const uint8_t *p) {
  int32_t v;
  memcpy(&v, p, 4);
  return v;
}
static int16_t rd_i16(const uint8_t *p) {
  int16_t v;
  memcpy(&v, p, 2);
  return v;
}

int64_t pktpu_read_wav_16k_mono(const char *filename, float **out) {
  *out = nullptr;
  FILE *fd = fopen(filename, "rb");
  if (!fd) return -1;
  fseek(fd, 0, SEEK_END);
  long file_size = ftell(fd);
  fseek(fd, 0, SEEK_SET);
  if (file_size < 44) { fclose(fd); return -2; }
  uint8_t *buf = (uint8_t *)malloc(file_size);
  if (!buf) { fclose(fd); return -1; }
  if (fread(buf, 1, file_size, fd) != (size_t)file_size) {
    free(buf); fclose(fd); return -1;
  }
  fclose(fd);

  int64_t rc = -2;
  float *samples = nullptr;
  do {
    if (memcmp(buf, "RIFF", 4) != 0) break;
    if (rd_i32(buf + 4) != file_size - 8) break;
    if (memcmp(buf + 8, "WAVE", 4) != 0) break;
    if (memcmp(buf + 12, "fmt ", 4) != 0) break;
    if (rd_i32(buf + 16) != 16) break;
    if (rd_i16(buf + 20) != 1) { rc = -3; break; }   // PCM only
    if (rd_i16(buf + 22) != 1) { rc = -3; break; }   // mono only
    int32_t sample_rate = rd_i32(buf + 24);
    if (sample_rate != 16000) { rc = -3; break; }
    int32_t bytes_rate = rd_i32(buf + 28);
    int16_t block_align = rd_i16(buf + 32);
    int16_t bits = rd_i16(buf + 34);
    if (bits != 8 && bits != 16 && bits != 32) { rc = -3; break; }
    if (bytes_rate != sample_rate * bits / 8) break;
    if (block_align != bits / 8) break;
    if (memcmp(buf + 36, "data", 4) != 0) break;
    int32_t data_size = rd_i32(buf + 40);
    if (data_size != file_size - 44) break;

    int64_t n = data_size / (bits / 8);
    samples = (float *)malloc(sizeof(float) * (n > 0 ? n : 1));
    if (!samples) { rc = -1; break; }
    const uint8_t *p = buf + 44;
    if (bits == 8) {
      const int8_t *s = (const int8_t *)p;
      for (int64_t i = 0; i < n; ++i) samples[i] = (float)s[i];
    } else if (bits == 16) {
      for (int64_t i = 0; i < n; ++i) samples[i] = (float)rd_i16(p + 2 * i);
    } else {
      for (int64_t i = 0; i < n; ++i) samples[i] = (float)rd_i32(p + 4 * i);
    }
    *out = samples;
    samples = nullptr;
    rc = n;
  } while (false);

  free(buf);
  free(samples);
  return rc;
}

void pktpu_free(void *p) { free(p); }

// ---------------------------------------------------------------------------
// FST bulk load (format: fst.cc:29-92 / SURVEY.md §2.3).
// Single pass: header check + three bulk reads into caller-provided buffers.
// Two-call protocol: pktpu_fst_header fills sizes, then pktpu_fst_load fills
// the arrays (finals float32[n_states], first_arc int32[n_states],
// arcs int32x3+float interleaved [n_arcs*4]).
// Returns 0 ok, negative error.
// ---------------------------------------------------------------------------

int32_t pktpu_fst_header(const char *filename, int32_t *n_states,
                         int32_t *n_arcs, int32_t *start_state) {
  FILE *fd = fopen(filename, "rb");
  if (!fd) return -1;
  uint8_t head[48];
  if (fread(head, 1, 48, fd) != 48) { fclose(fd); return -2; }
  fclose(fd);
  if (strncmp((const char *)head, "pk::fst_0", 9) != 0) return -2;
  int32_t section_size = rd_i32(head + 32);
  *n_states = rd_i32(head + 36);
  *n_arcs = rd_i32(head + 40);
  *start_state = rd_i32(head + 44);
  int64_t expected = 12 + (int64_t)*n_states * 8 + (int64_t)*n_arcs * 16;
  if (expected != section_size) return -2;
  return 0;
}

int32_t pktpu_fst_load(const char *filename, int32_t n_states,
                       int32_t n_arcs, float *finals, int32_t *first_arc,
                       void *arcs) {
  FILE *fd = fopen(filename, "rb");
  if (!fd) return -1;
  if (fseek(fd, 48, SEEK_SET) != 0) { fclose(fd); return -1; }
  size_t ok = 1;
  ok &= fread(finals, sizeof(float), n_states, fd) == (size_t)n_states;
  ok &= fread(first_arc, sizeof(int32_t), n_states, fd) == (size_t)n_states;
  ok &= fread(arcs, 16, n_arcs, fd) == (size_t)n_arcs;
  fclose(fd);
  return ok ? 0 : -2;
}

// ---------------------------------------------------------------------------
// Batched backpointer traceback (replaces the OLabel-chain unwind,
// decoder.cc:304-339, on the generation-record layout of decoder/beam.py).
//
//   prev, word:           int32 [B, T, G, K]
//   init_prev, init_word: int32 [B, G0, K]
//   slots:                int32 [B]     (-1 = no path)
//   num_frames:           int32 [B]
//   out_words:            int32 [B, max_words]  (filled front-aligned,
//                         chronological order); out_counts int32[B]
// Returns 0, or -1 if any utterance overflowed max_words.
// ---------------------------------------------------------------------------

int32_t pktpu_traceback_batch(const int32_t *prev, const int32_t *word,
                              const int32_t *init_prev,
                              const int32_t *init_word,
                              const int32_t *slots,
                              const int32_t *num_frames,
                              int32_t b_size, int32_t t_size, int32_t g_size,
                              int32_t g0_size, int32_t k_size,
                              int32_t *out_words, int32_t max_words,
                              int32_t *out_counts) {
  int32_t rc = 0;
  int32_t *scratch = (int32_t *)malloc(sizeof(int32_t) * max_words);
  if (!scratch) return -1;
  for (int32_t b = 0; b < b_size; ++b) {
    out_counts[b] = 0;
    int32_t slot = slots[b];
    if (slot < 0) continue;
    int32_t count = 0;
    const int64_t bt = (int64_t)b * t_size;
    bool overflow = false;
    for (int32_t t = num_frames[b] - 1; t >= 0 && !overflow; --t) {
      const int64_t base = ((bt + t) * g_size) * k_size;
      for (int32_t g = g_size - 1; g >= 0; --g) {
        const int64_t idx = base + (int64_t)g * k_size + slot;
        int32_t w = word[idx];
        if (w != 0) {
          if (count >= max_words) { overflow = true; break; }
          scratch[count++] = w;
        }
        slot = prev[idx];
      }
    }
    const int64_t ibase = (int64_t)b * g0_size * k_size;
    for (int32_t g = g0_size - 1; g >= 0 && !overflow; --g) {
      const int64_t idx = ibase + (int64_t)g * k_size + slot;
      int32_t w = init_word[idx];
      if (w != 0) {
        if (count >= max_words) { overflow = true; break; }
        scratch[count++] = w;
      }
      slot = init_prev[idx];
    }
    if (overflow) { rc = -1; continue; }
    // reverse into chronological order
    int32_t *dst = out_words + (int64_t)b * max_words;
    for (int32_t i = 0; i < count; ++i) dst[i] = scratch[count - 1 - i];
    out_counts[b] = count;
  }
  free(scratch);
  return rc;
}

}  // extern "C"
