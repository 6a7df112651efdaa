// Bulk-decode preparation: tokenize a block payload and resolve every
// token into a device record stream for the wave-free bulk reconstruction
// kernel (kernels/decode_bulk.py).
//
// Design (round 3, from the measured TPU roofline in BASELINE.md): the
// per-pair on-chip formulation is floor-bound by VPU issue and by Mosaic's
// index-blind ref aliasing, which serializes every store->read chain on
// the output buffer. This resolver restructures the work so the hot path
// has neither hazard:
//
//  * Each match source is resolved against the already-emitted interval
//    map. If it lands in <= kBulkResolveK final pieces, the pieces read
//    from ALREADY-FINAL space — the compacted literal plane, a constant
//    byte, or the previous windows' output (the 130-row tail the format's
//    16-bit offsets can reach, /root/reference/tsq_encode.cpp:298). These
//    records are mutually independent: the kernel reads a never-written
//    plane and builds each 512-byte output row in a register accumulator.
//  * Fragmented sources (piece count > K — deep chain regions) are NOT
//    split further (that cascades: measured 2.2 B/record on text).
//    They become single W-space records, topologically scheduled: the
//    record stream is an ordered sequence of row entries (rows may
//    repeat), and a W-space record appears only after the entries that
//    finalize its source bytes. Chain DEPTH is therefore free — it is
//    stream order, not kernel passes.
//  * Constant runs fold: zeros-class streams (wave depth measured up to
//    123k) collapse to a handful of FILL records.
//
// Record stream layout (consumed by the kernel's scalar unit), per window:
//   entry header, 2 words:
//     H0 = row_in_window
//     H1 = (nU << 16) | nW     nU U-space records, then nW W-space records
//   each record 2 words:
//     w0 = (dst_offset_in_row << 10) | length            length 1..512
//     w1 = bit31 FILL: | byte value (low 8)
//          bit29 WSRC: | window-relative source byte offset (this
//                        window's output, final by stream order)
//          else: U-space byte address — [0, kBulkTail) is the 130-row
//                tail region (previous windows' final output), then the
//                literal plane at kBulkTail + lit_offset. The kernel's
//                U scratch is laid out [tail | lit] to match, so source
//                row = address >> 9 with no flag arithmetic.
//
//   Every copy record's source lies within ONE 512-byte source row
//   (records split at source-row boundaries): the kernel gathers with a
//   single dynamic row slice per record.
//
// The tail must reach anchor - 65534 where the pair anchor can lie up to
// 64 bytes (one max ext symbol) before the window base: 65534 + 64 =
// 65598 <= kBulkTail = 130 rows * 512 = 66560.
#include <algorithm>
#include <cstring>
#include <vector>

#include "tsq_core.h"

namespace tsq {

namespace {

constexpr uint8_t kLit = 0;    // affine copy from the literal plane
constexpr uint8_t kOut = 1;    // final output bytes (previous windows)
constexpr uint8_t kConst = 2;  // constant byte run
constexpr uint8_t kSelf = 3;   // unresolved: this window's output bytes

struct Interval {
  uint32_t dst;
  uint32_t len;
  uint32_t src;  // kLit: literal offset; kOut: global out coordinate
                 // (identity after window close); kConst: byte value;
                 // kSelf: window-relative W source (forwarded)
  uint8_t kind;
};

struct Deferred {
  uint32_t dst;   // global output coordinate
  uint32_t len;
  uint32_t wsrc;  // window-relative W source offset
};

struct Resolver {
  const uint32_t size;
  uint32_t* rec;
  const uint64_t cap;
  uint32_t* meta;

  uint64_t n = 0;
  bool overflow = false;

  uint32_t win_start = 0, win_end = 0;

  // pending resolved record (affine/const coalescing before row split)
  bool have = false;
  uint32_t pdst = 0, plen = 0, psrc = 0;
  uint8_t pkind = 0;

  // open entry backpatch state (first-visit entries: U records only)
  int64_t hdr_pos = -1;
  uint32_t hdr_row = 0, hdr_cnt = 0;

  std::vector<Interval> iv;
  std::vector<Deferred> dq;
  bool dq_unsorted = false;
  // bucket index: for each 64-byte output bucket, the iv index of the
  // last interval starting at or before the bucket base — find() becomes
  // a lookup plus a short forward walk instead of a full binary search
  std::vector<uint32_t> bidx;
  uint32_t bnext = 0;  // next bucket to fill

  static constexpr uint32_t kBShift = 6;

  Resolver(uint32_t size_, uint32_t* rec_, uint64_t cap_, uint32_t* meta_,
           size_t payload_size)
      : size(size_), rec(rec_), cap(cap_), meta(meta_) {
    win_end = size < kBulkWin ? size : kBulkWin;
    // ~0.39 tokens per payload byte measured on level-0 text, the
    // token-densest class; iv gets ~1 interval per token (merges are
    // rare, measured 293/722k) and dq up to ~1 defer per match. Sizing
    // both up front kills ~16 MB of vector-doubling copies per block.
    size_t tok = payload_size / 2 + 4096;
    iv.reserve(tok);
    dq.reserve(tok);
    bidx.reserve(((kBlockSize + kMaxDict) >> kBShift) + 64);
    meta[4] = 0;
  }

  void close_entry() {
    if (hdr_pos >= 0) rec[hdr_pos + 1] = hdr_cnt << 16;  // nU, nW=0
    hdr_pos = -1;
    hdr_cnt = 0;
  }

  void put(uint32_t w0, uint32_t w1, uint32_t row) {
    if (n + 4 > cap) {
      overflow = true;
      return;
    }
    if (hdr_pos < 0 || row != hdr_row || hdr_cnt >= kBulkMaxEntryRecs) {
      close_entry();
      hdr_row = row;
      hdr_pos = (int64_t)n;
      rec[n++] = row;
      rec[n++] = 0;  // backpatched
    }
    rec[n++] = w0;
    rec[n++] = w1;
    ++hdr_cnt;
  }

  // split the pending resolved record at 512-byte DST rows and, for
  // copies, at 512-byte SOURCE rows too: the kernel's gather then reads
  // exactly one source row per record (single dynamic slice, no
  // row-crossing selects). Crossings add <= 2% records at typical
  // lengths.
  void flush_pending() {
    if (!have) return;
    have = false;
    uint32_t dst = pdst, len = plen, src = psrc;
    while (len) {
      uint32_t off = dst & 511u;
      uint32_t take = 512u - off;
      if (pkind != kConst) {
        uint32_t sroom = 512u - ((pkind == kOut
                                      ? src - (win_start - kBulkTail)
                                      : kBulkTail + src) & 511u);
        if (sroom < take) take = sroom;
      }
      if (take > len) take = len;
      uint32_t row = (dst - win_start) >> 9;
      uint32_t w0 = (off << 10) | take;
      uint32_t w1;
      if (pkind == kConst)
        w1 = 0x80000000u | (src & 0xFFu);
      else if (pkind == kOut)
        w1 = src - (win_start - kBulkTail);   // [0, kBulkTail)
      else
        w1 = kBulkTail + src;                 // literal plane
      put(w0, w1, row);
      dst += take;
      len -= take;
      if (pkind != kConst) src += take;
    }
  }

  // append one resolved piece (within the current window)
  void piece(uint32_t dst, uint32_t len, uint32_t src, uint8_t kind) {
    if (have && kind == pkind && dst == pdst + plen &&
        (kind == kConst ? src == psrc : src == psrc + plen)) {
      plen += len;
      return;
    }
    flush_pending();
    have = true;
    pdst = dst;
    plen = len;
    psrc = src;
    pkind = kind;
  }

  void push_iv(uint32_t dst, uint32_t len, uint32_t src, uint8_t kind) {
    if (!iv.empty()) {
      Interval& b = iv.back();
      if (b.kind == kind && b.dst + b.len == dst &&
          (kind == kConst ? b.src == src : b.src + b.len == src)) {
        b.len += len;
        index_to(b.dst + b.len);
        return;
      }
    }
    iv.push_back({dst, len, src, kind});
    index_to(dst + len);
  }

  // coverage is gapless, so every bucket whose base lies before the last
  // interval's end is covered by it or an earlier (already-indexed) one
  void index_to(uint32_t end) {
    uint32_t i = (uint32_t)iv.size() - 1;
    while ((bnext << kBShift) < end) {
      bidx.push_back(i);
      ++bnext;
    }
  }

  void rebuild_index() {
    bidx.clear();
    bnext = 0;
    for (uint32_t i = 0; i < (uint32_t)iv.size(); ++i) {
      uint32_t end = iv[i].dst + iv[i].len;
      while ((bnext << kBShift) < end) {
        bidx.push_back(i);
        ++bnext;
      }
    }
  }

  // emit deferred (W-space) entries in dst order — topologically valid
  // because every W record's producers write strictly smaller dst (match
  // sources precede the pair anchor). Entries are consecutive same-row
  // runs; an entry must CLOSE (forcing a store + fresh load) before a
  // record whose source range could overlap the open entry's own writes,
  // since in-entry contributions live in the accumulator, not in W yet.
  void emit_deferred() {
    // dq is already dst-ordered: defers happen in token order and token
    // dst is monotone; defer() tracks violations in O(1) so the common
    // path pays neither a sort nor a verify pass
    if (dq_unsorted) {
      std::stable_sort(dq.begin(), dq.end(),
                       [](const Deferred& a, const Deferred& b) {
                         return a.dst < b.dst;
                       });
      dq_unsorted = false;
    }
    int64_t whdr = -1;
    uint32_t wrow = 0, wcnt = 0;
    uint32_t entry_first = 0;  // window-relative first dst of open entry
    auto close_w = [&] {
      if (whdr >= 0) rec[whdr + 1] = wcnt;  // nU=0, nW=wcnt
      whdr = -1;
      wcnt = 0;
    };
    size_t k = 0;
    while (k < dq.size()) {
      // coalesce affine-contiguous runs — but never let the merged
      // source range reach the run's own destination (a chained copy
      // reading its own fresh output is not a single bulk copy)
      uint32_t dst = dq[k].dst, len = dq[k].len, wsrc = dq[k].wsrc;
      ++k;
      while (k < dq.size() && dq[k].dst == dst + len &&
             dq[k].wsrc == wsrc + len &&
             wsrc + len + dq[k].len <= dst - win_start) {
        len += dq[k].len;
        ++k;
      }
      while (len) {
        uint32_t off = dst & 511u;
        uint32_t take = 512u - off;
        uint32_t sroom = 512u - (wsrc & 511u);  // single source row
        if (sroom < take) take = sroom;
        if (take > len) take = len;
        uint32_t row = (dst - win_start) >> 9;
        if (n + 4 > cap) {
          overflow = true;
          return;
        }
        // conservative same-entry overlap rule: source at or beyond the
        // open entry's first write could read not-yet-stored bytes
        bool hazard = whdr >= 0 && row == wrow && wsrc + take > entry_first;
        if (whdr < 0 || row != wrow || hazard ||
            wcnt >= kBulkMaxEntryRecs) {
          close_w();
          whdr = (int64_t)n;
          wrow = row;
          entry_first = (dst - win_start);
          rec[n++] = row;
          rec[n++] = 0;  // backpatched by close_w
        }
        rec[n++] = (off << 10) | take;
        rec[n++] = 0x20000000u | wsrc;
        ++wcnt;
        dst += take;
        wsrc += take;
        len -= take;
      }
    }
    close_w();
    dq.clear();
  }

  void close_window() {
    flush_pending();
    close_entry();
    emit_deferred();
    uint32_t w = win_end / kBulkWin;  // index of the NEXT window
    if (4 + w < kBulkMetaWords) meta[4 + w] = (uint32_t)n;
    win_start = win_end;
    win_end = win_start + kBulkWin;
    if (win_end > size) win_end = size;
    // the window's bytes are now final: keep the interval map (so const
    // and literal knowledge survives — zeros-class chains would otherwise
    // lose their const-folding at every boundary), converting W-space and
    // followed-out mappings to IDENTITY out-space. Identity is always
    // within the NEXT windows' tail reach, since any future query qs is
    // within 65598 of its own dst.
    // in-place compaction (write index trails read index) so iv keeps
    // its reserved capacity across windows — a swap with a fresh vector
    // would re-pay the doubling copies as the next window's map regrows
    uint32_t w2 = 0;
    for (uint32_t r2 = 0; r2 < (uint32_t)iv.size(); ++r2) {
      Interval I = iv[r2];
      if (I.kind == kSelf || I.kind == kOut) {
        I.kind = kOut;
        I.src = I.dst;
      }
      if (w2) {
        Interval& b = iv[w2 - 1];
        if (b.kind == I.kind && b.dst + b.len == I.dst &&
            (I.kind == kConst ? b.src == I.src
                              : b.src + b.len == I.src)) {
          b.len += I.len;
          continue;
        }
      }
      iv[w2++] = I;
    }
    iv.resize(w2);
    rebuild_index();
  }

  // emit a resolved extent, splitting at window boundaries
  void emit(uint32_t dst, uint32_t len, uint32_t src, uint8_t kind) {
    while (len) {
      while (dst >= win_end && win_end < size) close_window();
      uint32_t take = win_end - dst;
      if (take > len) take = len;
      piece(dst, take, src, kind);
      push_iv(dst, take, src, kind);
      dst += take;
      len -= take;
      if (kind != kConst) src += take;
    }
  }

  // defer an extent to a W-space record (single window by construction).
  // wsrc_rel is window-relative; the interval records the SOURCE mapping
  // so later readers forward to it — forwarded sources point ever further
  // back, which keeps deferred entries mergeable.
  void defer(uint32_t dst, uint32_t len, uint32_t wsrc_rel) {
    if (!dq.empty() && dq.back().dst > dst) dq_unsorted = true;
    dq.push_back({dst, len, wsrc_rel});
    push_iv(dst, len, wsrc_rel, kSelf);
  }

  size_t find(uint32_t pos) const {  // last interval with .dst <= pos
    uint32_t bk = pos >> kBShift;
    size_t i = bk < bidx.size() ? bidx[bk] : (iv.empty() ? 0
                                                         : iv.size() - 1);
    while (i + 1 < iv.size() && iv[i + 1].dst <= pos) ++i;
    while (i > 0 && iv[i].dst > pos) --i;
    return i;
  }

  void finish() {
    flush_pending();
    close_entry();
    emit_deferred();
    for (uint32_t w = size ? (size + kBulkWin - 1) / kBulkWin : 0;
         w + 4 < kBulkMetaWords; ++w)
      meta[4 + w] = (uint32_t)n;
  }
};

}  // namespace

int64_t bulk_prep(const uint8_t* in, size_t in_size, bool ext,
                  const uint8_t* dict, uint32_t dict_len,
                  uint8_t* lit, uint64_t lit_cap,
                  uint32_t* rec, uint64_t rec_cap_words, uint32_t* meta) {
  if (in_size < 5) return kErrBadPayload;
  if (dict_len > kMaxDict) return kErrBadPayload;
  uint32_t size = in[0] | (in[1] << 8) | ((uint32_t)in[2] << 16);
  if (size > kBlockSize) return kErrBlockTooBig;
  // With a preset dictionary the output space is the dict-extended
  // [0, dict_len + size): the dictionary is staged as a synthetic
  // literal-plane copy at [0, dict_len) (the resolver twin of the
  // guard-region decode, csrc decode_block_dict), so match sources
  // reaching into the dictionary resolve like any literal interval and
  // the kernel needs no dictionary-specific paths at all.
  uint32_t total = dict_len + size;
  if (lit_cap < (uint64_t)total + 64) return kErrOutputTooSmall;
  meta[0] = size;
  meta[1] = total ? (total + kBulkWin - 1) / kBulkWin : 0;

  Resolver rs(total, rec, rec_cap_words, meta, in_size);
  uint64_t lit_n = 0;
  if (dict_len) {
    std::memcpy(lit, dict, dict_len);
    lit_n = dict_len;
    rs.emit(0, dict_len, 0, kLit);
  }
  size_t i = 3;
  uint32_t j = dict_len;

  while (j < total) {
    if (i >= in_size) return kErrTruncated;
    if (rs.overflow) return kBulkOverflow;  // abort early: caller retries
    uint32_t ctrl = in[i++];
    for (int pair = 0; pair < 4 && j < total; ++pair) {
      if (i >= in_size) return kErrTruncated;
      uint32_t size_byte = in[i++];
      const uint32_t pair_anchor = j;
      for (int half = 0; half < 2; ++half) {
        uint32_t nibble = half == 0 ? size_byte >> 4 : size_byte & 15;
        bool literal = (ctrl >> (7 - pair * 2 - half)) & 1;
        if (literal) {
          uint32_t sz = nibble + 1;
          if (j + sz > total) sz = total - j;  // corrupt-stream clamp
          if (i + nibble + 1 > in_size + 48) return kErrTruncated;
          if (sz) {
            // the caller guarantees 64 readable zero bytes past in_size
            // (native.bulk_prep pads), so a straight copy is exact
            std::memcpy(&lit[lit_n], &in[i], sz);
            bool is_const = true;
            for (uint32_t t = 1; t < sz && is_const; ++t)
              is_const = lit[lit_n + t] == lit[lit_n];
            if (is_const) {
              rs.emit(j, sz, lit[lit_n], kConst);
            } else {
              rs.emit(j, sz, (uint32_t)lit_n, kLit);
              lit_n += sz;
            }
            j += sz;
          }
          i += nibble + 1;
        } else {
          uint32_t off = in[i] | (in[i + 1] << 8);
          i += 2;
          if (off > pair_anchor) return kErrBadPayload;
          uint32_t qs = pair_anchor - off;
          uint32_t sz = ext && nibble < 3 ? 32 + 16 * nibble : nibble + 1;
          if (j + sz > total) sz = total - j;  // corrupt-stream clamp
          uint32_t qd = j, left = sz;
          bool counted = false, whole_defer = false;
          // Fast path (K == 1 semantics, the shipped constant): when the
          // copy stays inside the current window, one find() decides the
          // whole token — single covering interval emits/defers directly,
          // and a second probe classifies multi-piece sources — instead
          // of the generic dry-count walk + re-find emit loop doing every
          // lookup twice (measured ~25% of resolver time on text).
          while (qd >= rs.win_end && rs.win_end < total) rs.close_window();
          if (kBulkResolveK == 1 && left && qd + left <= rs.win_end &&
              !rs.iv.empty()) {
            const Interval I = rs.iv[rs.find(qs)];
            if (qs < I.dst || qs - I.dst >= I.len) return kErrBadPayload;
            uint32_t d = qs - I.dst, avail = I.len - d;
            if (avail >= left) {
              if (I.kind == kConst)
                rs.emit(qd, left, I.src, kConst);
              else if (I.kind == kSelf)
                rs.defer(qd, left, I.src + d);
              else
                rs.emit(qd, left, I.src + d, I.kind);
              left = 0;
            } else {
              // fragmented: defer whole IF the next piece exists (a gap
              // means self-overlap — the generic loop resolves it
              // incrementally against its own fresh intervals)
              uint32_t cs2 = qs + avail;
              const Interval& I2 = rs.iv[rs.find(cs2)];
              counted = true;
              whole_defer = cs2 >= I2.dst && cs2 - I2.dst < I2.len;
              if (whole_defer && qs >= rs.win_start) {
                rs.defer(qd, left, qs - rs.win_start);
                left = 0;
              }
            }
          }
          while (left) {
            while (qd >= rs.win_end && rs.win_end < total)
              rs.close_window();
            uint32_t wtake = rs.win_end - qd;
            if (wtake > left) wtake = left;
            uint32_t take;
            {
              if (rs.iv.empty()) return kErrBadPayload;
              if (!counted) {
                // dry-count the remaining in-window pieces once; a
                // fragmented source is deferred whole (not split — the
                // split cascade is what fragments the interval map)
                counted = true;
                int pieces = 0;
                uint32_t cs = qs, cl = left;
                while (cl && pieces <= kBulkResolveK) {
                  const Interval& I = rs.iv[rs.find(cs)];
                  if (cs < I.dst || cs - I.dst >= I.len) break;
                  uint32_t t = I.len - (cs - I.dst);
                  if (t > cl) t = cl;
                  ++pieces;
                  cs += t;
                  cl -= t;
                }
                whole_defer = pieces > kBulkResolveK;
              }
              if (whole_defer && qs < rs.win_start) {
                // W-space records cannot reach previous windows; emit the
                // pre-window portion as a final identity tail copy
                take = rs.win_start - qs;
                if (take > wtake) take = wtake;
                rs.emit(qd, take, qs, kOut);
              } else if (whole_defer) {
                take = wtake;
                rs.defer(qd, take, qs - rs.win_start);
              } else {
                const Interval I = rs.iv[rs.find(qs)];
                if (qs < I.dst || qs - I.dst >= I.len)
                  return kErrBadPayload;  // self-read / gap: corrupt
                uint32_t d = qs - I.dst;
                take = I.len - d;
                if (take > wtake) take = wtake;
                if (I.kind == kConst)
                  rs.emit(qd, take, I.src, kConst);
                else if (I.kind == kSelf)
                  // forward to the producer's SOURCE: those bytes are
                  // final before the producer's record runs, so chains
                  // neither lengthen dependencies nor fragment
                  rs.defer(qd, take, I.src + d);
                else
                  rs.emit(qd, take, I.src + d, I.kind);
              }
            }
            qs += take;
            qd += take;
            left -= take;
          }
          j += sz;
        }
      }
    }
  }
  rs.finish();
  if (rs.overflow) return kBulkOverflow;
  meta[2] = (uint32_t)lit_n;
  meta[3] = (uint32_t)rs.n;
  return (int64_t)rs.n;
}

}  // namespace tsq

extern "C" {

int64_t tsq_bulk_prep(const uint8_t* in, uint64_t in_size, int ext,
                      uint8_t* lit, uint64_t lit_cap, uint32_t* rec,
                      uint64_t rec_cap_words, uint32_t* meta) {
  return tsq::bulk_prep(in, in_size, ext != 0, nullptr, 0, lit, lit_cap,
                        rec, rec_cap_words, meta);
}

int64_t tsq_bulk_prep_dict(const uint8_t* in, uint64_t in_size, int ext,
                           const uint8_t* dict, uint32_t dict_len,
                           uint8_t* lit, uint64_t lit_cap, uint32_t* rec,
                           uint64_t rec_cap_words, uint32_t* meta) {
  return tsq::bulk_prep(in, in_size, ext != 0, dict, dict_len, lit,
                        lit_cap, rec, rec_cap_words, meta);
}

}  // extern "C"

namespace tsq {

// Zip N blocks' record streams into one strictly round-robin stream for
// the co-scheduled kernel (decode_bulkn): per window, entries cycle
// 0,1,..,N-1,0,1,.., padding exhausted streams with empty entries
// (row 0, zero records). Strict rotation lets the kernel process one
// entry per block per straight-line loop body against SEPARATE scratch
// refs — the only reliable way to overlap their gather chains (Mosaic
// neither pipelines across loop iterations nor past conds).
// metan (kBulkMetaNWords): [k] = size_k, [4+k] = n_win_k (k < 4),
// [8+w] = merged-stream boundary of window w ([8] = 0; window w spans
// [metan[8+w], metan[9+w])). Returns merged words or kBulkOverflow.
int64_t bulk_mergen(const uint32_t* const* recs, const uint32_t* const* mas,
                    uint32_t nblk, uint32_t* out, uint64_t cap,
                    uint32_t* metan) {
  if (nblk == 0 || nblk > 4) return kBulkOverflow;
  for (uint32_t w = 0; w < kBulkMetaNWords; ++w) metan[w] = 0;
  uint32_t n_win = 0;
  for (uint32_t k = 0; k < nblk; ++k) {
    metan[k] = mas[k][0];
    metan[4 + k] = mas[k][1];
    if (mas[k][1] > n_win) n_win = mas[k][1];
  }
  uint64_t n = 0;
  auto entry_len = [](const uint32_t* r, uint32_t p) {
    uint32_t h1 = r[p + 1];
    return 2 + 2 * ((h1 >> 16) + (h1 & 0xFFFF));
  };
  for (uint32_t w = 0; w < n_win; ++w) {
    uint32_t p[4], e[4];
    for (uint32_t k = 0; k < nblk; ++k) {
      p[k] = mas[k][4 + w];
      e[k] = mas[k][5 + w];
    }
    for (;;) {
      bool live = false;
      for (uint32_t k = 0; k < nblk; ++k) live |= p[k] < e[k];
      if (!live) break;
      if (n + nblk * (uint64_t)(2 + 2 * kBulkMaxEntryRecs) > cap)
        return kBulkOverflow;
      for (uint32_t k = 0; k < nblk; ++k) {
        if (p[k] < e[k]) {
          uint32_t l = entry_len(recs[k], p[k]);
          std::memcpy(out + n, recs[k] + p[k], 4 * l);
          n += l;
          p[k] += l;
        } else {
          out[n++] = 0;  // empty entry for an exhausted stream
          out[n++] = 0;
        }
      }
    }
    if (9 + w < kBulkMetaNWords) metan[9 + w] = (uint32_t)n;
  }
  for (uint32_t w = n_win; 9 + w < kBulkMetaNWords; ++w)
    metan[9 + w] = (uint32_t)n;
  return (int64_t)n;
}

// Two-block zip, kept for the decode_bulk2 kernel's 8-word meta ABI:
// meta2: [sizeA, sizeB, n_winA, n_winB, off_w0.., off_w(max)] over the
// merged stream. The stream bytes are mergen's n=2 rotation verbatim.
int64_t bulk_merge2(const uint32_t* ra, const uint32_t* ma,
                    const uint32_t* rb, const uint32_t* mb,
                    uint32_t* out, uint64_t cap, uint32_t* meta2) {
  const uint32_t* recs[2] = {ra, rb};
  const uint32_t* mas[2] = {ma, mb};
  uint32_t metan[kBulkMetaNWords];
  int64_t n = bulk_mergen(recs, mas, 2, out, cap, metan);
  if (n < 0) return n;
  meta2[0] = metan[0];
  meta2[1] = metan[1];
  meta2[2] = metan[4];
  meta2[3] = metan[5];
  for (uint32_t w = 0; 4 + w < kBulkMetaWords; ++w) meta2[4 + w] = metan[8 + w];
  return n;
}

}  // namespace tsq

extern "C" {

int64_t tsq_bulk_merge2(const uint32_t* ra, const uint32_t* ma,
                        const uint32_t* rb, const uint32_t* mb,
                        uint32_t* out, uint64_t cap, uint32_t* meta2) {
  return tsq::bulk_merge2(ra, ma, rb, mb, out, cap, meta2);
}

int64_t tsq_bulk_mergen(const uint32_t* const* recs,
                        const uint32_t* const* metas, uint32_t nblk,
                        uint32_t* out, uint64_t cap, uint32_t* metan) {
  return tsq::bulk_mergen(recs, metas, nblk, out, cap, metan);
}

}  // extern "C"
