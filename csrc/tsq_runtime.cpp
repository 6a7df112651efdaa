// Multithreaded block scheduler + container I/O.
//
// The upstream engine is a reader/workers/writer pipeline over per-worker
// ring buffers with round-robin block assignment (tsq_threads.cpp, described
// in SURVEY.md §2/§3). This runtime re-derives the same capability as a
// work-stealing block scheduler: an atomic block cursor feeds a shared pool,
// completed blocks land in an ordered results table, and a streaming writer
// drains them in stream order. Per-worker state is one EncoderState plus
// padded scratch buffers; blocks are pure functions of their bytes, so
// scheduling order never affects output.
#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <functional>
#include <memory>
#include <mutex>
#include <thread>
#include <vector>

#include "tsq_core.h"

namespace tsq {
namespace {

int pool_size(int n_threads) {
  if (n_threads > 0) return n_threads;
  unsigned hc = std::thread::hardware_concurrency();
  return hc ? (int)hc : 4;
}

struct BlockRange {
  const uint8_t* data;
  size_t size;
};

inline size_t n_blocks_for(size_t size) {
  return (size + kBlockSize - 1) / kBlockSize;
}

// Run fn(worker_id, block_index) over [0, n_blocks) on a transient pool.
// Returns false if any invocation reported failure.
bool parallel_blocks(size_t n_blocks, int n_threads,
                     const std::function<bool(int, size_t)>& fn) {
  int T = std::min<size_t>(pool_size(n_threads), n_blocks ? n_blocks : 1);
  if (T <= 1) {
    for (size_t b = 0; b < n_blocks; ++b)
      if (!fn(0, b)) return false;
    return true;
  }
  std::atomic<size_t> cursor{0};
  std::atomic<bool> ok{true};
  std::vector<std::thread> threads;
  threads.reserve(T);
  for (int t = 0; t < T; ++t) {
    threads.emplace_back([&, t] {
      for (;;) {
        size_t b = cursor.fetch_add(1, std::memory_order_relaxed);
        if (b >= n_blocks || !ok.load(std::memory_order_relaxed)) break;
        if (!fn(t, b)) ok.store(false, std::memory_order_relaxed);
      }
    });
  }
  for (auto& th : threads) th.join();
  return ok.load();
}

// Per-worker encode scratch: zero-padded input staging + worst-case output.
struct EncodeScratch {
  EncoderState state;
  std::vector<uint8_t> in;   // kBlockSize + kEncInSlack, tail kept zero
  std::vector<uint8_t> out;  // kOutputSize + 32
  std::vector<int32_t> cand;  // candidate array, level >= 1 only
  EncodeScratch()
      : in(kBlockSize + kEncInSlack, 0), out(kOutputSize + 32, 0) {}

  // Encode honoring the compression level: 0 = reference-parity hash-table
  // parse; 1 = exact hash-chain candidates (better ratio, ~2x cost);
  // >= 2 = lazy one-step-deferred parse over the same candidates.
  uint32_t encode(uint32_t bsz, bool ext, uint32_t level,
                  uint8_t* dst = nullptr) {
    if (!dst) dst = out.data();
    if (level == 0) return encode_block(state, in.data(), bsz, dst, ext);
    if (cand.empty()) cand.resize(kBlockSize);
    build_candidates(in.data(), bsz, cand.data());
    if (level >= 2)
      return encode_block_lazy(in.data(), bsz, cand.data(), dst, ext,
                               level);
    return encode_block_candidates(in.data(), bsz, cand.data(), dst, ext);
  }
};

struct DecodeScratch {
  std::vector<uint8_t> out;  // kBlockSize + kDecOutSlack
  std::vector<uint8_t> in;   // payload staging for slack-unsafe tails
  DecodeScratch() : out(kBlockSize + kDecOutSlack) {}
};

// Shared per-block progress ticker. The count increment and the callback
// run under one mutex so fractions reach the callback MONOTONICALLY even
// when worker threads finish blocks back-to-back (an unlocked fetch_add
// could deliver done=2 before done=1); workers hold no GIL here, so the
// ctypes trampoline's GIL acquisition cannot deadlock against it.
struct ProgressTicker {
  ProgressFn fn;
  void* ctx;
  uint64_t total;
  uint64_t done = 0;
  std::mutex m;
  void tick() {
    if (!fn) return;
    std::lock_guard<std::mutex> g(m);
    fn(ctx, ++done, total);
  }
};

void write_header(uint8_t* out, uint32_t n_blocks, uint64_t total) {
  std::memcpy(out, "TSQ1", 4);
  std::memcpy(out + 4, &n_blocks, 4);
  std::memcpy(out + 8, &total, 8);
}

void write_block_header(uint8_t* out, uint32_t payload, bool ext) {
  uint32_t w = payload | (ext ? kExtFlag : 0);
  out[0] = w & 0xFF;
  out[1] = (w >> 8) & 0xFF;
  out[2] = (w >> 16) & 0xFF;
}

}  // namespace

int64_t compress_mt(const uint8_t* in, size_t in_size, uint8_t* out,
                    size_t out_capacity, bool ext, uint32_t level,
                    int n_threads, ProgressFn progress, void* progress_ctx) {
  ProgressTicker ticker{progress, progress_ctx, n_blocks_for(in_size)};
  size_t n_blocks = n_blocks_for(in_size);
  if (out_capacity < kContainerHeaderSize) return kErrOutputTooSmall;
  write_header(out, (uint32_t)n_blocks, in_size);
  if (n_blocks == 0) return kContainerHeaderSize;

  const size_t slot = kBlockHeaderSize + (size_t)kOutputSize + 32;
  if (out_capacity < kContainerHeaderSize + n_blocks * slot)
    return kErrOutputTooSmall;  // callers size with compress_bound()
  int T = std::min<size_t>(pool_size(n_threads), n_blocks);

  if (T <= 1) {
    // Sequential fast path: blocks complete in stream order, so each one
    // encodes DIRECTLY at its final position — no worst-case slot
    // spreading (which touches ~bound bytes of fresh pages; first-touch
    // faults dominate the wrapper cost on small-page VMs) and no
    // compaction pass. Scratch persists across calls (thread_local): the
    // 9 MiB staging/output buffers stay warm between bench passes and
    // repeated jobs, mirroring the upstream MT context's long-lived ring
    // buffers (tsq_context.cpp:101-125).
    static thread_local EncodeScratch scratch_st;
    size_t w = kContainerHeaderSize;
    for (size_t b = 0; b < n_blocks; ++b) {
      size_t off = b * (size_t)kBlockSize;
      uint32_t bsz = (uint32_t)std::min<size_t>(kBlockSize, in_size - off);
      std::memcpy(scratch_st.in.data(), in + off, bsz);
      std::memset(scratch_st.in.data() + bsz, 0, kEncInSlack);
      uint32_t psz = scratch_st.encode(bsz, ext, level,
                                       out + w + kBlockHeaderSize);
      write_block_header(out + w, psz, ext);
      w += kBlockHeaderSize + psz;
      ticker.tick();
    }
    return (int64_t)w;
  }

  // Stage 1: encode each block DIRECTLY into its worst-case slot in the
  // output (compressed sizes are unknown until encoded, so blocks land at
  // worst-case spacing first); stage 2 compacts left in order — one
  // in-place memmove instead of the staging-buffer copy + concat copy.
  std::vector<uint32_t> sizes(n_blocks);
  std::vector<std::unique_ptr<EncodeScratch>> scratch;
  for (int t = 0; t < T; ++t) scratch.emplace_back(new EncodeScratch());

  bool ok = parallel_blocks(n_blocks, n_threads, [&](int t, size_t b) {
    EncodeScratch& s = *scratch[t];
    size_t off = b * (size_t)kBlockSize;
    uint32_t bsz = (uint32_t)std::min<size_t>(kBlockSize, in_size - off);
    // Stage the input into the zero-padded buffer: the encoder reads past
    // the block end; zeros there pin determinism (format spec convention).
    std::memcpy(s.in.data(), in + off, bsz);
    std::memset(s.in.data() + bsz, 0, kEncInSlack);
    uint8_t* dst = out + kContainerHeaderSize + b * slot + kBlockHeaderSize;
    sizes[b] = s.encode(bsz, ext, level, dst);
    ticker.tick();
    return true;
  });
  if (!ok) return kErrBadPayload;

  // Stage 2: ordered in-place compaction (the writer-thread role). Final
  // positions never exceed staged positions, so left-moving memmove is safe.
  size_t w = kContainerHeaderSize;
  for (size_t b = 0; b < n_blocks; ++b) {
    size_t psz = sizes[b];
    write_block_header(out + w, (uint32_t)psz, ext);
    w += kBlockHeaderSize;
    std::memmove(out + w,
                 out + kContainerHeaderSize + b * slot + kBlockHeaderSize,
                 psz);
    w += psz;
  }
  return (int64_t)w;
}

int64_t decompress_mt(const uint8_t* in, size_t in_size, uint8_t* out,
                      size_t out_capacity, int n_threads,
                      ProgressFn progress, void* progress_ctx) {
  if (in_size < kContainerHeaderSize) return kErrTruncated;
  if (std::memcmp(in, "TSQ1", 4) != 0) return kErrBadMagic;
  uint32_t n_blocks;
  uint64_t total;
  std::memcpy(&n_blocks, in + 4, 4);
  std::memcpy(&total, in + 8, 8);
  if (out_capacity < total) return kErrOutputTooSmall;

  // Serial header scan: block k's payload offset depends on sizes 0..k-1
  // (3 bytes per 4 MiB; negligible).
  struct Entry {
    size_t off;
    uint32_t size;
    bool ext;
  };
  std::vector<Entry> table(n_blocks);
  size_t off = kContainerHeaderSize;
  for (uint32_t b = 0; b < n_blocks; ++b) {
    if (off + kBlockHeaderSize > in_size) return kErrTruncated;
    uint32_t w = in[off] | (in[off + 1] << 8) | ((uint32_t)in[off + 2] << 16);
    uint32_t psz = w & kPayloadMask;
    off += kBlockHeaderSize;
    if (off + psz > in_size) return kErrTruncated;
    table[b] = {off, psz, (w & kExtFlag) != 0};
    off += psz;
  }

  int T = pool_size(n_threads);
  std::vector<std::unique_ptr<DecodeScratch>> scratch;
  for (int t = 0; t < T; ++t) scratch.emplace_back(new DecodeScratch());
  std::atomic<int64_t> err{0};
  std::atomic<uint64_t> produced{0};
  ProgressTicker ticker{progress, progress_ctx, n_blocks};

  parallel_blocks(n_blocks, n_threads, [&](int t, size_t b) {
    DecodeScratch& s = *scratch[t];
    const Entry& e = table[b];
    const uint8_t* payload = in + e.off;
    // The decoder reads up to kDecInSlack past the payload; every block but
    // the last has following container bytes there. Stage the tail block.
    if (e.off + e.size + kDecInSlack > in_size) {
      s.in.assign(payload, payload + e.size);
      s.in.resize(e.size + kDecInSlack, 0);
      payload = s.in.data();
    }
    // Decode DIRECTLY into the shared output: the block decoder never
    // writes past its declared size (fast loop stops 640 bytes early,
    // exact-width tail), so concurrently decoded neighbors can't clobber
    // each other and no staging copy is needed.
    size_t dst = b * (size_t)kBlockSize;
    if (dst >= total) {
      err.store(kErrBadPayload);
      return false;
    }
    int64_t r = decode_block(payload, e.size, out + dst, total - dst, e.ext);
    if (r < 0) {
      err.store(r);
      return false;
    }
    produced.fetch_add((uint64_t)r);
    ticker.tick();
    return true;
  });
  if (err.load() != 0) return err.load();
  if (produced.load() != total) return kErrBadPayload;
  return (int64_t)total;
}

// --- Dictionary container codec (framework extension) -------------------------

int64_t compress_mt_dict(const uint8_t* in, size_t in_size,
                         const uint8_t* dict, uint32_t dict_len,
                         uint8_t* out, size_t out_capacity, bool ext,
                         int n_threads, uint32_t level,
                         ProgressFn progress, void* progress_ctx) {
  ProgressTicker ticker{progress, progress_ctx, n_blocks_for(in_size)};
  if (dict_len == 0 || dict_len > kMaxDict) return kErrBadPayload;
  size_t n_blocks = n_blocks_for(in_size);
  if (out_capacity < kContainerHeaderSize) return kErrOutputTooSmall;
  write_header(out, (uint32_t)n_blocks, in_size);
  if (n_blocks == 0) return kContainerHeaderSize;

  struct DictScratch {
    std::vector<uint8_t> concat;
    std::vector<int32_t> cand;
    std::vector<uint8_t> out;
    DictScratch()
        : concat(kMaxDict + kBlockSize + kEncInSlack, 0),
          cand(kMaxDict + kBlockSize),
          out(kOutputSize + 32, 0) {}
  };
  int T = pool_size(n_threads);
  std::vector<std::unique_ptr<DictScratch>> scratch;
  for (int t = 0; t < T; ++t) scratch.emplace_back(new DictScratch());

  std::vector<std::vector<uint8_t>> results(n_blocks);
  bool ok = parallel_blocks(n_blocks, n_threads, [&](int t, size_t b) {
    DictScratch& s = *scratch[t];
    size_t off = b * (size_t)kBlockSize;
    uint32_t bsz = (uint32_t)std::min<size_t>(kBlockSize, in_size - off);
    std::memcpy(s.concat.data(), dict, dict_len);
    std::memcpy(s.concat.data() + dict_len, in + off, bsz);
    std::memset(s.concat.data() + dict_len + bsz, 0, kEncInSlack);
    build_candidates(s.concat.data(), dict_len + bsz, s.cand.data());
    uint32_t psz = encode_block_dict(s.concat.data(), dict_len, bsz,
                                     s.cand.data(), s.out.data(), ext,
                                     level);
    results[b].assign(s.out.data(), s.out.data() + psz);
    ticker.tick();
    return true;
  });
  if (!ok) return kErrBadPayload;

  size_t w = kContainerHeaderSize;
  for (size_t b = 0; b < n_blocks; ++b) {
    size_t psz = results[b].size();
    if (w + kBlockHeaderSize + psz > out_capacity) return kErrOutputTooSmall;
    write_block_header(out + w, (uint32_t)psz, ext);
    w += kBlockHeaderSize;
    std::memcpy(out + w, results[b].data(), psz);
    w += psz;
  }
  return (int64_t)w;
}

int64_t decompress_mt_dict(const uint8_t* in, size_t in_size,
                           const uint8_t* dict, uint32_t dict_len,
                           uint8_t* out, size_t out_capacity, int n_threads,
                           ProgressFn progress, void* progress_ctx) {
  if (dict_len == 0 || dict_len > kMaxDict) return kErrBadPayload;
  if (in_size < kContainerHeaderSize) return kErrTruncated;
  if (std::memcmp(in, "TSQ1", 4) != 0) return kErrBadMagic;
  uint32_t n_blocks;
  uint64_t total;
  std::memcpy(&n_blocks, in + 4, 4);
  std::memcpy(&total, in + 8, 8);
  if (out_capacity < total) return kErrOutputTooSmall;

  struct Entry {
    size_t off;
    uint32_t size;
    bool ext;
  };
  std::vector<Entry> table(n_blocks);
  size_t off = kContainerHeaderSize;
  for (uint32_t b = 0; b < n_blocks; ++b) {
    if (off + kBlockHeaderSize > in_size) return kErrTruncated;
    uint32_t w = in[off] | (in[off + 1] << 8) | ((uint32_t)in[off + 2] << 16);
    uint32_t psz = w & kPayloadMask;
    off += kBlockHeaderSize;
    if (off + psz > in_size) return kErrTruncated;
    table[b] = {off, psz, (w & kExtFlag) != 0};
    off += psz;
  }

  struct DictDecScratch {
    std::vector<uint8_t> out;
    std::vector<uint8_t> in;
    DictDecScratch() : out(kMaxDict + kBlockSize + kDecOutSlack) {}
  };
  ProgressTicker ticker{progress, progress_ctx, n_blocks};
  int T = pool_size(n_threads);
  std::vector<std::unique_ptr<DictDecScratch>> scratch;
  for (int t = 0; t < T; ++t) scratch.emplace_back(new DictDecScratch());
  std::atomic<int64_t> err{0};
  std::atomic<uint64_t> produced{0};

  parallel_blocks(n_blocks, n_threads, [&](int t, size_t b) {
    DictDecScratch& s = *scratch[t];
    const Entry& e = table[b];
    const uint8_t* payload = in + e.off;
    if (e.off + e.size + kDecInSlack > in_size) {
      s.in.assign(payload, payload + e.size);
      s.in.resize(e.size + kDecInSlack, 0);
      payload = s.in.data();
    }
    int64_t r = decode_block_dict(payload, e.size, dict, dict_len,
                                  s.out.data(), s.out.size(), e.ext);
    if (r < 0) {
      err.store(r);
      return false;
    }
    size_t dst = b * (size_t)kBlockSize;
    if (dst + (uint64_t)r > total) {
      err.store(kErrBadPayload);
      return false;
    }
    std::memcpy(out + dst, s.out.data() + dict_len, (size_t)r);
    produced.fetch_add((uint64_t)r);
    ticker.tick();
    return true;
  });
  if (err.load() != 0) return err.load();
  if (produced.load() != total) return kErrBadPayload;
  return (int64_t)total;
}

// --- File streaming ----------------------------------------------------------

int64_t compress_file(const char* in_path, const char* out_path, bool ext,
                      uint32_t level, int n_threads, ProgressFn progress,
                      void* progress_ctx) {
  FILE* fi = std::fopen(in_path, "rb");
  if (!fi) return kErrIo;
  FILE* fo = std::fopen(out_path, "wb");
  if (!fo) {
    std::fclose(fi);
    return kErrIo;
  }

  std::fseek(fi, 0, SEEK_END);
  long fsize = std::ftell(fi);
  std::fseek(fi, 0, SEEK_SET);
  size_t total = (size_t)fsize;
  size_t n_blocks = n_blocks_for(total);

  uint8_t hdr[kContainerHeaderSize];
  write_header(hdr, (uint32_t)n_blocks, total);
  ProgressTicker ticker{progress, progress_ctx, n_blocks};
  int64_t status = 0;
  size_t written = 0;
  if (std::fwrite(hdr, 1, sizeof hdr, fo) != sizeof hdr) status = kErrIo;
  written += sizeof hdr;

  // Windowed pipeline: read up to W blocks, encode them in parallel, write
  // in order while the next window is read. W = 2x threads bounds memory at
  // ~18 MB per worker.
  int T = pool_size(n_threads);
  size_t W = (size_t)T * 2;
  std::vector<std::unique_ptr<EncodeScratch>> scratch;
  for (int t = 0; t < T; ++t) scratch.emplace_back(new EncodeScratch());

  std::vector<std::vector<uint8_t>> inputs(W), outputs(W);
  size_t done = 0;
  while (status == 0 && done < n_blocks) {
    size_t batch = std::min(W, n_blocks - done);
    for (size_t k = 0; k < batch; ++k) {
      size_t off = (done + k) * (size_t)kBlockSize;
      size_t bsz = std::min<size_t>(kBlockSize, total - off);
      inputs[k].resize(bsz + kEncInSlack);
      if (std::fread(inputs[k].data(), 1, bsz, fi) != bsz) {
        status = kErrIo;
        break;
      }
      std::memset(inputs[k].data() + bsz, 0, kEncInSlack);
    }
    if (status != 0) break;
    parallel_blocks(batch, n_threads, [&](int t, size_t k) {
      EncodeScratch& s = *scratch[t];
      uint32_t bsz = (uint32_t)(inputs[k].size() - kEncInSlack);
      std::memcpy(s.in.data(), inputs[k].data(), bsz);
      std::memset(s.in.data() + bsz, 0, kEncInSlack);
      uint32_t psz = s.encode(bsz, ext, level);
      outputs[k].resize(kBlockHeaderSize + psz);
      write_block_header(outputs[k].data(), psz, ext);
      std::memcpy(outputs[k].data() + kBlockHeaderSize, s.out.data(), psz);
      ticker.tick();
      return true;
    });
    for (size_t k = 0; k < batch && status == 0; ++k) {
      if (std::fwrite(outputs[k].data(), 1, outputs[k].size(), fo) !=
          outputs[k].size())
        status = kErrIo;
      written += outputs[k].size();
    }
    done += batch;
  }

  std::fclose(fi);
  std::fclose(fo);
  return status == 0 ? (int64_t)written : status;
}

int64_t decompress_file(const char* in_path, const char* out_path,
                        int n_threads, ProgressFn progress,
                        void* progress_ctx) {
  FILE* fi = std::fopen(in_path, "rb");
  if (!fi) return kErrIo;
  FILE* fo = std::fopen(out_path, "wb");
  if (!fo) {
    std::fclose(fi);
    return kErrIo;
  }

  int64_t status = 0;
  uint8_t hdr[kContainerHeaderSize];
  uint32_t n_blocks = 0;
  uint64_t total = 0;
  if (std::fread(hdr, 1, sizeof hdr, fi) != sizeof hdr ||
      std::memcmp(hdr, "TSQ1", 4) != 0) {
    status = kErrBadMagic;
  } else {
    std::memcpy(&n_blocks, hdr + 4, 4);
    std::memcpy(&total, hdr + 8, 8);
  }
  ProgressTicker ticker{progress, progress_ctx, n_blocks};

  int T = pool_size(n_threads);
  size_t W = (size_t)T * 2;
  // no per-worker scratch: blocks decode directly into the write staging

  std::vector<std::vector<uint8_t>> inputs(W);
  std::vector<std::vector<uint8_t>> outputs(W);
  std::vector<bool> exts(W);
  uint64_t written = 0;
  size_t done = 0;
  while (status == 0 && done < n_blocks) {
    size_t batch = std::min(W, (size_t)n_blocks - done);
    for (size_t k = 0; k < batch && status == 0; ++k) {
      uint8_t bh[kBlockHeaderSize];
      if (std::fread(bh, 1, sizeof bh, fi) != sizeof bh) {
        status = kErrTruncated;
        break;
      }
      uint32_t w = bh[0] | (bh[1] << 8) | ((uint32_t)bh[2] << 16);
      uint32_t psz = w & kPayloadMask;
      exts[k] = (w & kExtFlag) != 0;
      inputs[k].resize(psz + kDecInSlack);
      if (std::fread(inputs[k].data(), 1, psz, fi) != psz) {
        status = kErrTruncated;
        break;
      }
      std::memset(inputs[k].data() + psz, 0, kDecInSlack);
    }
    if (status != 0) break;
    std::atomic<int64_t> err{0};
    parallel_blocks(batch, n_threads, [&](int t, size_t k) {
      (void)t;
      size_t psz = inputs[k].size() - kDecInSlack;
      // Decode DIRECTLY into the output staging vector (sized from the
      // declared block size) — no per-block scratch copy. The block
      // decoder never writes past its declared size (fast loop stops 640
      // bytes early, exact-width tail), so exact capacity suffices.
      uint32_t decl = psz >= 3 ? (inputs[k][0] | (inputs[k][1] << 8) |
                                  ((uint32_t)inputs[k][2] << 16))
                               : 0;
      outputs[k].resize(std::min<uint32_t>(decl, kBlockSize));
      int64_t r = decode_block(inputs[k].data(), psz, outputs[k].data(),
                               outputs[k].size(), exts[k]);
      if (r < 0) {
        err.store(r);
        return false;
      }
      outputs[k].resize(r);
      ticker.tick();
      return true;
    });
    if (err.load() != 0) {
      status = err.load();
      break;
    }
    for (size_t k = 0; k < batch && status == 0; ++k) {
      if (std::fwrite(outputs[k].data(), 1, outputs[k].size(), fo) !=
          outputs[k].size())
        status = kErrIo;
      written += outputs[k].size();
    }
    done += batch;
  }

  std::fclose(fi);
  std::fclose(fo);
  if (status == 0 && written != total) status = kErrBadPayload;
  return status == 0 ? (int64_t)written : status;
}

}  // namespace tsq
