// Gang-stream merger: re-shape per-block bulk record streams
// (csrc/tsq_bulk.cpp ABI) into the fixed-geometry stream consumed by the
// round-4 co-scheduled gang kernel (kernels/decode_gang.py).
//
// Why (measured, BENCH_r03 / bench/ab_decode.py): the entry-granular
// co-schedule (bulk_mergen) could not overlap its blocks' work — each
// entry's stream position is only known after the previous entry's
// header is parsed, so the co-scheduled chains still formed one serial
// scalar chain, and bulk2/bulk4 measured the same ~220 MB/s/chip as the
// single-block kernel. This stream removes every data-dependent position:
//
//   * the unit of work is a GANG: 8 records, one output row, 16 words,
//     16-word aligned (so a gang never straddles a 512-byte stream row
//     and the kernel's parameter extraction needs no wraparound selects);
//   * a ROUND is nblk gangs, one per co-scheduled block, in block order.
//     Round r's gang k sits at word (r*nblk + k)*16 — pure arithmetic,
//     so the kernel's loop body is nblk straight-line, mutually
//     independent chains (separate scratch refs, no parse);
//   * per window the stream has a U segment (records reading the
//     never-written [tail|literal] plane) then a W segment (records
//     reading this window's own finalized rows). bulk_prep already emits
//     windows in exactly this phase order (emit_deferred runs at window
//     close), so the split is a relabeling, not a reorder: the kernel
//     picks the source ref per SEGMENT — no per-gang conds;
//   * entries shorter than a multiple of 8 pad with null records
//     (len=0, FILL byte 0), exhausted blocks pad with null gangs, and
//     every segment pads to kGangAlignRounds rounds so the kernel may
//     unroll its round loop without remainder code.
//
// Gang slot layout (16 u32 words): records j at words [2j, 2j+1] with
//   w0 = (row << 19) | (dst_off << 10) | len      (row only on j = 0;
//        the kernel masks offsets with &511 — bulk_prep offsets are 9
//        bits so the row bits are free there)
//   w1 = as bulk_prep: bit31 FILL | byte, bit29 WSRC | window-relative
//        source, else U-plane byte address.
//
// gmeta (kGangMetaWords = 32): [0..7] block sizes, [8..15] n_windows,
// [16+2w] cumulative rounds at the end of window w's U segment,
// [17+2w] cumulative rounds at the end of window w's W segment (w < 3),
// [30] total rounds, [31] nblk.
#include <cstring>

#include "tsq_core.h"

namespace tsq {

namespace {

constexpr uint32_t kNullW1 = 0x80000000u;  // FILL byte 0, source row 0

// Cursor over one block's records of one phase (U or W) within one
// window's entry span [p, end). kRecs records per slot (8 = one record
// per sublane; 16/32 halve/quarter the kernel's per-gang fixed costs —
// acc load/store, row read — at slightly higher entry padding).
struct PhaseCur {
  const uint32_t* rec = nullptr;
  uint32_t p = 0, end = 0;
  uint32_t row = 0;    // current entry's output row
  uint32_t base = 0;   // word offset of the current entry's phase records
  uint32_t cnt = 0;    // phase records in the current entry
  uint32_t idx = 0;    // consumed so far
  bool w_phase = false;

  void open(const uint32_t* rec_, uint32_t p_, uint32_t end_, bool w) {
    rec = rec_;
    p = p_;
    end = end_;
    w_phase = w;
    idx = cnt = 0;
    advance();
  }

  // position on the next entry with records in this phase
  void advance() {
    while (idx >= cnt) {
      if (p >= end) return;  // exhausted
      uint32_t h1 = rec[p + 1];
      uint32_t nu = h1 >> 16, nw = h1 & 0xFFFFu;
      row = rec[p];
      base = w_phase ? p + 2 + 2 * nu : p + 2;
      cnt = w_phase ? nw : nu;
      idx = 0;
      p += 2 + 2 * (nu + nw);
    }
  }

  bool done() const { return idx >= cnt; }

  // write one gang slot of `recs` records (2*recs words); returns false
  // when exhausted (the caller emits a null gang instead)
  bool slot(uint32_t* o, uint32_t recs) {
    if (done()) return false;
    uint32_t take = cnt - idx;
    if (take > recs) take = recs;
    std::memcpy(o, rec + base + 2 * idx, 8 * take);
    for (uint32_t j = take; j < recs; ++j) {
      o[2 * j] = 0;
      o[2 * j + 1] = kNullW1;
    }
    o[0] = (o[0] & ~(0xFFFu << 19)) | (row << 19);
    idx += take;
    if (done()) advance();
    return true;
  }
};

void null_gang(uint32_t* o, uint32_t recs) {
  for (uint32_t j = 0; j < recs; ++j) {
    o[2 * j] = 0;
    o[2 * j + 1] = kNullW1;
  }
}

}  // namespace

int64_t bulk_gang(const uint32_t* const* recs, const uint32_t* const* mas,
                  uint32_t nblk, uint32_t slot_recs, uint32_t* out,
                  uint64_t cap, uint32_t* gmeta) {
  if (nblk == 0 || nblk > kGangMaxBlocks) return kBulkBadArg;
  if (slot_recs != 8 && slot_recs != 16 && slot_recs != 32)
    return kBulkBadArg;
  for (uint32_t i = 0; i < kGangMetaWords; ++i) gmeta[i] = 0;
  uint32_t n_win = 0;
  for (uint32_t k = 0; k < nblk; ++k) {
    gmeta[k] = mas[k][0];
    gmeta[8 + k] = mas[k][1];
    if (mas[k][1] > n_win) n_win = mas[k][1];
  }
  if (n_win > kBulkMetaWords - 5) return kBulkBadArg;  // > 3 windows
  const uint64_t round_words = (uint64_t)nblk * 2 * slot_recs;
  uint64_t rounds = 0;
  PhaseCur cur[kGangMaxBlocks];
  for (uint32_t w = 0; w < n_win; ++w) {
    for (int phase = 0; phase < 2; ++phase) {
      for (uint32_t k = 0; k < nblk; ++k)
        cur[k].open(recs[k], mas[k][4 + w], mas[k][5 + w], phase == 1);
      for (;;) {
        bool live = false;
        for (uint32_t k = 0; k < nblk; ++k) live |= !cur[k].done();
        bool align = live || (rounds % kGangAlignRounds) != 0;
        if (!align) break;
        if ((rounds + 1) * round_words > cap) return kBulkOverflow;
        uint32_t* o = out + rounds * round_words;
        for (uint32_t k = 0; k < nblk; ++k, o += 2 * slot_recs)
          if (!cur[k].slot(o, slot_recs)) null_gang(o, slot_recs);
        ++rounds;
      }
      if (16 + 2 * w + phase < kGangMetaWords - 2)
        gmeta[16 + 2 * w + phase] = (uint32_t)rounds;
    }
  }
  for (uint32_t w = n_win; 17 + 2 * w < kGangMetaWords - 2; ++w) {
    gmeta[16 + 2 * w] = (uint32_t)rounds;
    gmeta[17 + 2 * w] = (uint32_t)rounds;
  }
  gmeta[30] = (uint32_t)rounds;
  gmeta[31] = nblk;
  return (int64_t)(rounds * round_words);
}

}  // namespace tsq

extern "C" {

int64_t tsq_bulk_gang(const uint32_t* const* recs,
                      const uint32_t* const* metas, uint32_t nblk,
                      uint32_t slot_recs, uint32_t* out, uint64_t cap,
                      uint32_t* gmeta) {
  return tsq::bulk_gang(recs, metas, nblk, slot_recs, out, cap, gmeta);
}

}  // extern "C"
