// First-party DEFLATE (zlib-wrapped) decoder for the PNG hot path.
//
// Why it exists: on the 1-core bench host, PNG inflate is the single
// largest host-CPU stage of the inference pipeline (~240 ms per
// 512-line chunk through the system libdeflate 1.14 at ~240 MB/s; see
// DESIGN.md roofline).  Noisy scan-like PNGs are literal-heavy, and a
// single stream's literal decode is latency-bound: every table lookup
// depends on the previous code's length (load-to-use ~5 cycles), so one
// stream cannot beat ~4 ns/byte on this core no matter the table
// layout.  The lever a *batch* decoder has that a generic library
// doesn't: decode TWO independent streams in lockstep in one thread —
// two dependency chains fill each other's load-latency bubbles
// (inflate_pair; decode_png_batch feeds it image pairs).
//
// Single-stream path: 64-bit bit-buffer with 8-byte unaligned refills,
// 11-bit primary tables with packed {bits,symbol,literal-flag} entries
// and chained subtables, literal bursts (5 per refill), overlap-
// tolerant 8-byte match copies, no adler32 pass (PNG integrity is
// covered by the surrounding checks; the caller opts in).
//
// Scope: whole-buffer decompression with a known exact output size (the
// PNG case: (w*bpp+1)*h).  Returns 0 on success, nonzero on malformed
// input; the caller (preproc.cpp zlib_inflate_buf) falls back to
// libdeflate/zlib on nonzero, so this fast path can never lose data.
//
// This is an independent implementation of RFC 1950/1951 (the format is
// fully specified there); no code is derived from zlib or libdeflate.

#pragma once

#include <cstdint>
#include <cstring>

namespace fastinf {

// ---- bit reader -----------------------------------------------------------
struct BitReader {
  const uint8_t* p = nullptr;
  const uint8_t* end = nullptr;
  uint64_t bitbuf = 0;
  int bitcnt = 0;   // valid low bits in bitbuf

  void refill() {
    // load 8 bytes when safely available; else byte-at-a-time tail
    if (bitcnt <= 56) {
      if (end - p >= 8) {
        uint64_t w;
        std::memcpy(&w, p, 8);
        bitbuf |= w << bitcnt;
        const int take = (63 - bitcnt) >> 3;
        p += take;
        bitcnt += take << 3;
      } else {
        while (bitcnt <= 56 && p < end) {
          bitbuf |= static_cast<uint64_t>(*p++) << bitcnt;
          bitcnt += 8;
        }
      }
    }
  }
  inline uint32_t peek(int n) const {
    return static_cast<uint32_t>(bitbuf & ((1u << n) - 1));
  }
  inline void consume(int n) {
    bitbuf >>= n;
    bitcnt -= n;
  }
  inline uint32_t read(int n) {
    refill();
    const uint32_t v = peek(n);
    consume(n);
    return v;
  }
  inline void align_byte() {
    const int drop = bitcnt & 7;
    bitbuf >>= drop;
    bitcnt -= drop;
  }
  // true if we consumed past the end (bitcnt can go negative only on
  // malformed input)
  inline bool overrun() const { return bitcnt < 0; }
};

// ---- Huffman tables -------------------------------------------------------
// Entry layout (u32):
//   bits 0..7   : total code bits to consume (0 => invalid entry)
//   bits 8..23  : symbol value, or subtable index when flagged
//   bit  30     : literal flag (symbol < lit_threshold — lets the fast
//                 loop test "emittable literal" with one AND)
//   bit  31     : subtable link flag
constexpr int kLitlenTableBits = 11;
constexpr int kDistTableBits = 8;
constexpr uint32_t kSubFlag = 0x80000000u;
constexpr uint32_t kLitFlag = 0x40000000u;

struct HuffTable {
  uint32_t table[1 << kLitlenTableBits];
  // worst case: every >tbits code owns a distinct low pattern — 288
  // codes x 16-entry subtables for litlen; 8192 covers it with margin
  uint32_t sub[8192];
  int sub_used = 0;
  int table_bits = kLitlenTableBits;

  // Build from code lengths; returns false on an over-subscribed code
  // (malformed stream).  max_sym <= 288, lengths in [0, 15].
  // Symbols < lit_threshold get kLitFlag (0 disables).
  bool build(const uint8_t* lens, int n, int tbits, int lit_threshold = 0) {
    table_bits = tbits;
    sub_used = 0;
    int count[16] = {0};
    for (int i = 0; i < n; ++i) ++count[lens[i]];
    if (count[0] == n) return false;  // no codes at all
    int left = 1;
    uint32_t next_code[16];
    uint32_t code = 0;
    for (int b = 1; b <= 15; ++b) {
      left = (left << 1) - count[b];
      if (left < 0) return false;     // over-subscribed
      next_code[b] = code;
      code = (code + count[b]) << 1;
    }
    std::memset(table, 0, sizeof(uint32_t) << tbits);

    for (int sym = 0; sym < n; ++sym) {
      const int len = lens[sym];
      if (len == 0) continue;
      const uint32_t c = next_code[len]++;
      uint32_t rc = 0;   // bit-reverse to index LSB-first
      for (int b = 0; b < len; ++b) rc |= ((c >> (len - 1 - b)) & 1u) << b;
      const uint32_t lflag = sym < lit_threshold ? kLitFlag : 0u;
      if (len <= tbits) {
        const uint32_t entry = static_cast<uint32_t>(len) |
                               (static_cast<uint32_t>(sym) << 8) | lflag;
        for (uint32_t idx = rc; idx < (1u << tbits); idx += (1u << len))
          table[idx] = entry;
      } else {
        const uint32_t low = rc & ((1u << tbits) - 1);
        const int extra = len - tbits;
        uint32_t head = table[low];
        int sub_bits, sub_base;
        if (head & kSubFlag) {
          sub_base = (head >> 8) & 0xFFFF;
          sub_bits = head & 0xFF;
        } else {
          sub_bits = 15 - tbits;
          sub_base = sub_used;
          sub_used += 1 << sub_bits;
          if (sub_used > static_cast<int>(sizeof(sub) / 4)) return false;
          std::memset(sub + sub_base, 0, sizeof(uint32_t) << sub_bits);
          table[low] = kSubFlag | (static_cast<uint32_t>(sub_base) << 8) |
                       static_cast<uint32_t>(sub_bits);
        }
        const uint32_t hi = rc >> tbits;
        const uint32_t entry = static_cast<uint32_t>(len) |
                               (static_cast<uint32_t>(sym) << 8) | lflag;
        for (uint32_t idx = hi; idx < (1u << sub_bits); idx += (1u << extra))
          sub[sub_base + idx] = entry;
      }
    }
    return true;
  }

  // decode one symbol; returns symbol or -1 on invalid. Consumes bits.
  inline int decode(BitReader& br) const {
    br.refill();
    uint32_t e = table[br.peek(table_bits)];
    if (e & kSubFlag) {
      const int sub_bits = e & 0xFF;
      const uint32_t base = (e >> 8) & 0xFFFF;
      br.consume(table_bits);
      br.refill();
      e = sub[base + br.peek(sub_bits)];
      if (!(e & 0xFF)) return -1;
      br.consume((e & 0xFF) - table_bits);
      return static_cast<int>((e >> 8) & 0xFFFF);
    }
    if (!(e & 0xFF)) return -1;
    br.consume(e & 0xFF);
    return static_cast<int>((e >> 8) & 0xFFFF);
  }
};

// length / distance base tables (RFC 1951 section 3.2.5)
constexpr uint16_t kLenBase[29] = {
    3,  4,  5,  6,  7,  8,  9,  10, 11,  13,  15,  17,  19,  23, 27,
    31, 35, 43, 51, 59, 67, 83, 99, 115, 131, 163, 195, 227, 258};
constexpr uint8_t kLenExtra[29] = {0, 0, 0, 0, 0, 0, 0, 0, 1, 1, 1, 1, 2, 2,
                                   2, 2, 3, 3, 3, 3, 4, 4, 4, 4, 5, 5, 5, 5,
                                   0};
constexpr uint16_t kDistBase[30] = {
    1,    2,    3,    4,    5,    7,     9,     13,    17,   25,
    33,   49,   65,   97,   129,  193,   257,   385,   513,  769,
    1025, 1537, 2049, 3073, 4097, 6145,  8193,  12289, 16385, 24577};
constexpr uint8_t kDistExtra[30] = {0, 0, 0,  0,  1,  1,  2,  2,  3,  3,
                                    4, 4, 5,  5,  6,  6,  7,  7,  8,  8,
                                    9, 9, 10, 10, 11, 11, 12, 12, 13, 13};

inline void fixed_litlen_lens(uint8_t* lens) {
  int i = 0;
  for (; i < 144; ++i) lens[i] = 8;
  for (; i < 256; ++i) lens[i] = 9;
  for (; i < 280; ++i) lens[i] = 7;
  for (; i < 288; ++i) lens[i] = 8;
}

inline void copy_match(uint8_t* out, size_t pos, uint32_t dist,
                       uint32_t len) {
  uint8_t* dst = out + pos;
  const uint8_t* src = dst - dist;
  if (dist >= 8) {
    uint32_t n = len;
    while (n >= 8) {
      std::memcpy(dst, src, 8);
      dst += 8;
      src += 8;
      n -= 8;
    }
    while (n--) *dst++ = *src++;
  } else if (dist == 1) {
    std::memset(dst, src[0], len);
  } else {
    for (uint32_t i = 0; i < len; ++i) dst[i] = src[i];
  }
}

// ---- resumable stream -----------------------------------------------------
// state: 0 = at a block boundary, 1 = inside a compiled block,
//        2 = stream complete, negative = -(error code)
struct InflateStream {
  BitReader br;
  uint8_t* dst = nullptr;
  size_t dst_n = 0, pos = 0;
  uint32_t bfinal = 0;
  int state = 0;
  HuffTable litlen, dist;

  void init(const uint8_t* src, size_t n, uint8_t* d, size_t dn) {
    br = BitReader{src, src + n};
    dst = d;
    dst_n = dn;
    pos = 0;
    bfinal = 0;
    state = 0;
  }

  // zlib header; returns false (state=-1) on unsupported/malformed
  bool init_zlib(const uint8_t* src, size_t n, uint8_t* d, size_t dn) {
    if (n < 6) return false;
    const uint8_t cmf = src[0], flg = src[1];
    if ((cmf & 0x0F) != 8 || ((cmf << 8) | flg) % 31 != 0 || (flg & 0x20))
      return false;
    init(src + 2, n - 2, d, dn);
    return true;
  }

  // At a block boundary: consume block header(s).  Stored blocks are
  // copied here entirely; on return state is 1 (tables built), 2
  // (stream done), or negative (error).
  void prepare() {
    while (state == 0) {
      bfinal = br.read(1);
      const uint32_t btype = br.read(2);
      if (br.overrun()) { state = -1; return; }
      if (btype == 0) {  // stored
        br.align_byte();
        uint32_t hdr[4];
        for (int i = 0; i < 4; ++i) hdr[i] = br.read(8);
        if (br.overrun()) { state = -1; return; }
        const uint32_t len = hdr[0] | (hdr[1] << 8);
        const uint32_t nlen = hdr[2] | (hdr[3] << 8);
        if ((len ^ 0xFFFF) != nlen) { state = -1; return; }
        if (pos + len > dst_n) { state = -2; return; }
        uint32_t got = 0;
        while (got < len && br.bitcnt >= 8) {
          dst[pos + got] = static_cast<uint8_t>(br.bitbuf & 0xFF);
          br.consume(8);
          ++got;
        }
        const uint32_t rest = len - got;
        if (static_cast<size_t>(br.end - br.p) < rest) { state = -1; return; }
        std::memcpy(dst + pos + got, br.p, rest);
        br.p += rest;
        if (rest > 0) {
          // p jumped without flowing through the bit buffer: the
          // speculative duplicate byte a refill may have left above
          // bitcnt now mirrors the OLD position — clear it, or the next
          // refill ORs fresh bits over stale ones.  (rest > 0 implies
          // the drain emptied the buffer: bitcnt == 0, only garbage
          // above it.)
          br.bitbuf = 0;
          br.bitcnt = 0;
        }
        pos += len;
        if (bfinal) state = 2;
        continue;
      }
      if (btype == 3) { state = -1; return; }
      if (btype == 1) {
        uint8_t ll[288], dd[30];
        fixed_litlen_lens(ll);
        std::memset(dd, 5, sizeof(dd));
        if (!litlen.build(ll, 288, kLitlenTableBits, 256) ||
            !dist.build(dd, 30, kDistTableBits)) {
          state = -1;
          return;
        }
      } else {  // dynamic
        const uint32_t hlit = br.read(5) + 257;
        const uint32_t hdist = br.read(5) + 1;
        const uint32_t hclen = br.read(4) + 4;
        if (br.overrun() || hlit > 288 || hdist > 30) { state = -1; return; }
        static const uint8_t ord[19] = {16, 17, 18, 0, 8,  7, 9,  6, 10, 5,
                                        11, 4,  12, 3, 13, 2, 14, 1, 15};
        uint8_t cl_lens[19] = {0};
        for (uint32_t i = 0; i < hclen; ++i)
          cl_lens[ord[i]] = static_cast<uint8_t>(br.read(3));
        if (br.overrun()) { state = -1; return; }
        static thread_local HuffTable cl;
        if (!cl.build(cl_lens, 19, 7)) { state = -1; return; }
        uint8_t lens[288 + 30];
        uint32_t got = 0;
        const uint32_t want = hlit + hdist;
        while (got < want) {
          const int sym = cl.decode(br);
          if (sym < 0 || br.overrun()) { state = -1; return; }
          if (sym < 16) {
            lens[got++] = static_cast<uint8_t>(sym);
          } else if (sym == 16) {
            if (got == 0) { state = -1; return; }
            const uint32_t rep = 3 + br.read(2);
            if (got + rep > want) { state = -1; return; }
            std::memset(lens + got, lens[got - 1], rep);
            got += rep;
          } else if (sym == 17) {
            const uint32_t rep = 3 + br.read(3);
            if (got + rep > want) { state = -1; return; }
            std::memset(lens + got, 0, rep);
            got += rep;
          } else {
            const uint32_t rep = 11 + br.read(7);
            if (got + rep > want) { state = -1; return; }
            std::memset(lens + got, 0, rep);
            got += rep;
          }
        }
        if (lens[256] == 0 ||
            !litlen.build(lens, hlit, kLitlenTableBits, 256) ||
            !dist.build(lens + hlit, hdist, kDistTableBits)) {
          state = -1;
          return;
        }
      }
      state = 1;
    }
  }

  inline const uint8_t* in_safe_end() const { return br.end - 16; }
  inline size_t out_fast_end() const {
    return dst_n > 280 ? dst_n - 280 : 0;
  }
  inline bool fast_ok() const {
    return state == 1 && br.p <= in_safe_end() && pos < out_fast_end();
  }

  // Finish the whole stream from the current state, single-stream.
  // Returns 0 / 1 (malformed) / 2 (size mismatch).
  int run() {
    for (;;) {
      if (state == 2) return pos == dst_n ? 0 : 2;
      if (state < 0) return -state;
      if (state == 0) {
        prepare();
        continue;
      }
      decode_block();
    }
  }

  // Decode the current compiled block to its end-of-block symbol (or an
  // error); advances state to 0 / 2 / negative.
  void decode_block() {
    // fastloop with local (register) state — members (pos, dst, tables)
    // hoisted so the hot loop never round-trips through `this`
    uint64_t bb = br.bitbuf;
    int bc = br.bitcnt;
    const uint8_t* ip = br.p;
    size_t lpos = pos;
    uint8_t* const ldst = dst;
    const uint32_t* const ltab = litlen.table;
    const uint32_t* const lsub = litlen.sub;
    const uint32_t* const dtab = dist.table;
    const uint32_t* const dsub = dist.sub;
    const uint8_t* const safe_in = in_safe_end();
    const size_t fast_out = out_fast_end();
    bool ok = true, done = false;
    constexpr uint32_t LMASK = (1u << kLitlenTableBits) - 1;

#define FI_REFILL()                                        \
  do {                                                     \
    uint64_t w_;                                           \
    std::memcpy(&w_, ip, 8);                               \
    bb |= w_ << bc;                                        \
    ip += (63 - bc) >> 3;                                  \
    bc |= 56;                                              \
  } while (0)

    while (ip <= safe_in && lpos < fast_out) {
      FI_REFILL();
      uint32_t e = ltab[bb & LMASK];
      if (e & kLitFlag) {
        // burst: primary entries are <= 11 bits; 5 always fit 56
        ldst[lpos++] = static_cast<uint8_t>(e >> 8);
        bb >>= e & 0xFF;
        bc -= e & 0xFF;
        e = ltab[bb & LMASK];
        if (e & kLitFlag) {
          ldst[lpos++] = static_cast<uint8_t>(e >> 8);
          bb >>= e & 0xFF;
          bc -= e & 0xFF;
          e = ltab[bb & LMASK];
          if (e & kLitFlag) {
            ldst[lpos++] = static_cast<uint8_t>(e >> 8);
            bb >>= e & 0xFF;
            bc -= e & 0xFF;
            e = ltab[bb & LMASK];
            if (e & kLitFlag) {
              ldst[lpos++] = static_cast<uint8_t>(e >> 8);
              bb >>= e & 0xFF;
              bc -= e & 0xFF;
              e = ltab[bb & LMASK];
              if (e & kLitFlag) {
                ldst[lpos++] = static_cast<uint8_t>(e >> 8);
                bb >>= e & 0xFF;
                bc -= e & 0xFF;
              }
            }
          }
        }
        continue;
      }
      // non-literal path with a full bit budget
      if (e & kSubFlag) {
        bb >>= kLitlenTableBits;
        bc -= kLitlenTableBits;
        e = lsub[((e >> 8) & 0xFFFF) + (bb & ((1u << (e & 0xFF)) - 1))];
        if (!(e & 0xFF)) { ok = false; break; }
        const int used = static_cast<int>(e & 0xFF) - kLitlenTableBits;
        bb >>= used;
        bc -= used;
      } else {
        if (!(e & 0xFF)) { ok = false; break; }
        bb >>= e & 0xFF;
        bc -= e & 0xFF;
      }
      const uint32_t sym = (e >> 8) & 0xFFFF;
      if (sym < 256) {
        ldst[lpos++] = static_cast<uint8_t>(sym);
        continue;
      }
      if (sym == 256) { done = true; break; }
      const uint32_t li = sym - 257;
      if (li >= 29) { ok = false; break; }
      const int lx = kLenExtra[li];
      const uint32_t len = kLenBase[li] +
                           static_cast<uint32_t>(bb & ((1u << lx) - 1));
      bb >>= lx;
      bc -= lx;
      e = dtab[bb & ((1u << kDistTableBits) - 1)];
      if (e & kSubFlag) {
        bb >>= kDistTableBits;
        bc -= kDistTableBits;
        e = dsub[((e >> 8) & 0xFFFF) + (bb & ((1u << (e & 0xFF)) - 1))];
        if (!(e & 0xFF)) { ok = false; break; }
        const int used = static_cast<int>(e & 0xFF) - kDistTableBits;
        bb >>= used;
        bc -= used;
      } else {
        if (!(e & 0xFF)) { ok = false; break; }
        bb >>= e & 0xFF;
        bc -= e & 0xFF;
      }
      const uint32_t dsym = (e >> 8) & 0xFFFF;
      if (dsym >= 30) { ok = false; break; }
      const int dx = kDistExtra[dsym];
      if (bc < dx) FI_REFILL();
      const uint32_t dv = kDistBase[dsym] +
                          static_cast<uint32_t>(bb & ((1u << dx) - 1));
      bb >>= dx;
      bc -= dx;
      if (dv > lpos) { ok = false; break; }
      // fast_out guarantees pos + 258 + 8 <= dst_n: the chunked copy may
      // overshoot by < 8 inside the buffer, never past it
      uint8_t* d = ldst + lpos;
      const uint8_t* s = d - dv;
      if (dv >= 8) {
        uint32_t n8 = 0;
        do {
          std::memcpy(d + n8, s + n8, 8);
          n8 += 8;
        } while (n8 < len);
      } else if (dv == 1) {
        std::memset(d, s[0], len);
      } else {
        for (uint32_t i = 0; i < len; ++i) d[i] = s[i];
      }
      lpos += len;
    }
#undef FI_REFILL
    br.bitbuf = bb;
    br.bitcnt = bc;
    br.p = ip;
    pos = lpos;
    if (!ok) { state = -1; return; }
    if (!done) {
      // careful tail (bounds-checked every step)
      for (;;) {
        const int sym = litlen.decode(br);
        if (sym < 0 || br.overrun()) { state = -1; return; }
        if (sym < 256) {
          if (pos >= dst_n) { state = -2; return; }
          dst[pos++] = static_cast<uint8_t>(sym);
          continue;
        }
        if (sym == 256) break;
        const uint32_t li = static_cast<uint32_t>(sym - 257);
        if (li >= 29) { state = -1; return; }
        br.refill();
        const uint32_t len = kLenBase[li] + br.read(kLenExtra[li]);
        const int dsym = dist.decode(br);
        if (dsym < 0 || dsym >= 30 || br.overrun()) { state = -1; return; }
        const uint32_t dv = kDistBase[dsym] + br.read(kDistExtra[dsym]);
        if (br.overrun() || dv > pos) { state = -1; return; }
        if (pos + len > dst_n) { state = -2; return; }
        copy_match(dst, pos, dv, len);
        pos += len;
      }
    }
    state = bfinal ? 2 : 0;
  }
};

// ---- single-stream entry --------------------------------------------------
inline int zlib_inflate(const uint8_t* src, size_t n, uint8_t* dst,
                        size_t dst_n) {
  static thread_local InflateStream s;
  if (!s.init_zlib(src, n, dst, dst_n)) return 1;
  return s.run();
}

// ---- interleaved pair -----------------------------------------------------
// Decode two independent zlib streams in lockstep: per iteration each
// stream refills once and decodes a 3-literal burst (or one match /
// end-of-block).  The two dependency chains overlap, hiding the L1
// load-to-use latency that bounds single-stream literal decode.
// Returns (rcA << 4) | rcB packed? No — results via out params.
inline void zlib_inflate_pair(const uint8_t* srcA, size_t nA, uint8_t* dstA,
                              size_t dnA, const uint8_t* srcB, size_t nB,
                              uint8_t* dstB, size_t dnB, int* rcA,
                              int* rcB) {
  static thread_local InflateStream A, B;
  const bool okA = A.init_zlib(srcA, nA, dstA, dnA);
  const bool okB = B.init_zlib(srcB, nB, dstB, dnB);
  if (!okA || !okB) {
    *rcA = okA ? A.run() : 1;
    *rcB = okB ? B.run() : 1;
    return;
  }

  constexpr uint32_t LMASK = (1u << kLitlenTableBits) - 1;
  for (;;) {
    if (A.state == 0) A.prepare();
    if (B.state == 0) B.prepare();
    if (!A.fast_ok() || !B.fast_ok()) break;

    // local register state for both streams
    uint64_t bbA = A.br.bitbuf, bbB = B.br.bitbuf;
    int bcA = A.br.bitcnt, bcB = B.br.bitcnt;
    const uint8_t* ipA = A.br.p;
    const uint8_t* ipB = B.br.p;
    size_t posA = A.pos, posB = B.pos;
    uint8_t* const dA = A.dst;
    uint8_t* const dB = B.dst;
    const uint8_t* const safeA = A.in_safe_end();
    const uint8_t* const safeB = B.in_safe_end();
    const size_t fastA = A.out_fast_end();
    const size_t fastB = B.out_fast_end();
    int exitA = 0, exitB = 0;  // 0 run, 1 eob, -1 error

#define FI_RF(bb, bc, ip)                                  \
  do {                                                     \
    uint64_t w_;                                           \
    std::memcpy(&w_, ip, 8);                               \
    bb |= w_ << bc;                                        \
    ip += (63 - bc) >> 3;                                  \
    bc |= 56;                                              \
  } while (0)

// One stream's step after its refill: 3-literal burst, or the general
// symbol path (match / eob / subtable).  Consumes <= 48 bits.
#define FI_STEP(S, bb, bc, ip, pos, dstp, exitf)                           \
  do {                                                                     \
    uint32_t e = S.litlen.table[bb & LMASK];                               \
    if (e & kLitFlag) {                                                    \
      dstp[pos++] = static_cast<uint8_t>(e >> 8);                          \
      bb >>= e & 0xFF;                                                     \
      bc -= e & 0xFF;                                                      \
      e = S.litlen.table[bb & LMASK];                                      \
      if (e & kLitFlag) {                                                  \
        dstp[pos++] = static_cast<uint8_t>(e >> 8);                        \
        bb >>= e & 0xFF;                                                   \
        bc -= e & 0xFF;                                                    \
        e = S.litlen.table[bb & LMASK];                                    \
        if (e & kLitFlag) {                                                \
          dstp[pos++] = static_cast<uint8_t>(e >> 8);                      \
          bb >>= e & 0xFF;                                                 \
          bc -= e & 0xFF;                                                  \
        }                                                                  \
      }                                                                    \
      break;                                                               \
    }                                                                      \
    if (e & kSubFlag) {                                                    \
      bb >>= kLitlenTableBits;                                             \
      bc -= kLitlenTableBits;                                              \
      e = S.litlen.sub[((e >> 8) & 0xFFFF) +                               \
                       (bb & ((1u << (e & 0xFF)) - 1))];                   \
      if (!(e & 0xFF)) { exitf = -1; break; }                              \
      const int used_ = static_cast<int>(e & 0xFF) - kLitlenTableBits;     \
      bb >>= used_;                                                        \
      bc -= used_;                                                         \
    } else {                                                               \
      if (!(e & 0xFF)) { exitf = -1; break; }                              \
      bb >>= e & 0xFF;                                                     \
      bc -= e & 0xFF;                                                      \
    }                                                                      \
    const uint32_t sym_ = (e >> 8) & 0xFFFF;                               \
    if (sym_ < 256) {                                                      \
      dstp[pos++] = static_cast<uint8_t>(sym_);                            \
      break;                                                               \
    }                                                                      \
    if (sym_ == 256) { exitf = 1; break; }                                 \
    const uint32_t li_ = sym_ - 257;                                       \
    if (li_ >= 29) { exitf = -1; break; }                                  \
    const int lx_ = kLenExtra[li_];                                        \
    const uint32_t len_ = kLenBase[li_] +                                  \
                          static_cast<uint32_t>(bb & ((1u << lx_) - 1));   \
    bb >>= lx_;                                                            \
    bc -= lx_;                                                             \
    e = S.dist.table[bb & ((1u << kDistTableBits) - 1)];                   \
    if (e & kSubFlag) {                                                    \
      bb >>= kDistTableBits;                                               \
      bc -= kDistTableBits;                                                \
      e = S.dist.sub[((e >> 8) & 0xFFFF) +                                 \
                     (bb & ((1u << (e & 0xFF)) - 1))];                     \
      if (!(e & 0xFF)) { exitf = -1; break; }                              \
      const int used_ = static_cast<int>(e & 0xFF) - kDistTableBits;       \
      bb >>= used_;                                                        \
      bc -= used_;                                                         \
    } else {                                                               \
      if (!(e & 0xFF)) { exitf = -1; break; }                              \
      bb >>= e & 0xFF;                                                     \
      bc -= e & 0xFF;                                                      \
    }                                                                      \
    const uint32_t dsym_ = (e >> 8) & 0xFFFF;                              \
    if (dsym_ >= 30) { exitf = -1; break; }                                \
    const int dx_ = kDistExtra[dsym_];                                     \
    if (bc < dx_) FI_RF(bb, bc, ip);                                       \
    const uint32_t dv_ = kDistBase[dsym_] +                                \
                         static_cast<uint32_t>(bb & ((1u << dx_) - 1));    \
    bb >>= dx_;                                                            \
    bc -= dx_;                                                             \
    if (dv_ > pos) { exitf = -1; break; }                                  \
    uint8_t* d_ = dstp + pos;                                              \
    const uint8_t* s_ = d_ - dv_;                                          \
    if (dv_ >= 8) {                                                        \
      uint32_t n8_ = 0;                                                    \
      do {                                                                 \
        std::memcpy(d_ + n8_, s_ + n8_, 8);                                \
        n8_ += 8;                                                          \
      } while (n8_ < len_);                                                \
    } else if (dv_ == 1) {                                                 \
      std::memset(d_, s_[0], len_);                                        \
    } else {                                                               \
      for (uint32_t i_ = 0; i_ < len_; ++i_) d_[i_] = s_[i_];              \
    }                                                                      \
    pos += len_;                                                           \
  } while (0)

    const uint32_t* const ltA = A.litlen.table;
    const uint32_t* const ltB = B.litlen.table;
    while (ipA <= safeA && posA < fastA && ipB <= safeB && posB < fastB) {
      FI_RF(bbA, bcA, ipA);
      FI_RF(bbB, bcB, ipB);
      uint32_t eA = ltA[bbA & LMASK];
      uint32_t eB = ltB[bbB & LMASK];
      if (eA & eB & kLitFlag) {
        // interleaved literal ladder: A/B alternate per literal so the
        // two table-load dependency chains overlap; 4 rounds consume
        // <= 44 bits per stream of the >= 56 refilled
        dA[posA++] = static_cast<uint8_t>(eA >> 8);
        bbA >>= eA & 0xFF;
        bcA -= eA & 0xFF;
        dB[posB++] = static_cast<uint8_t>(eB >> 8);
        bbB >>= eB & 0xFF;
        bcB -= eB & 0xFF;
        eA = ltA[bbA & LMASK];
        eB = ltB[bbB & LMASK];
        if (eA & eB & kLitFlag) {
          dA[posA++] = static_cast<uint8_t>(eA >> 8);
          bbA >>= eA & 0xFF;
          bcA -= eA & 0xFF;
          dB[posB++] = static_cast<uint8_t>(eB >> 8);
          bbB >>= eB & 0xFF;
          bcB -= eB & 0xFF;
          eA = ltA[bbA & LMASK];
          eB = ltB[bbB & LMASK];
          if (eA & eB & kLitFlag) {
            dA[posA++] = static_cast<uint8_t>(eA >> 8);
            bbA >>= eA & 0xFF;
            bcA -= eA & 0xFF;
            dB[posB++] = static_cast<uint8_t>(eB >> 8);
            bbB >>= eB & 0xFF;
            bcB -= eB & 0xFF;
            eA = ltA[bbA & LMASK];
            eB = ltB[bbB & LMASK];
            if (eA & eB & kLitFlag) {
              dA[posA++] = static_cast<uint8_t>(eA >> 8);
              bbA >>= eA & 0xFF;
              bcA -= eA & 0xFF;
              dB[posB++] = static_cast<uint8_t>(eB >> 8);
              bbB >>= eB & 0xFF;
              bcB -= eB & 0xFF;
            }
          }
        }
        continue;
      }
      FI_STEP(A, bbA, bcA, ipA, posA, dA, exitA);
      FI_STEP(B, bbB, bcB, ipB, posB, dB, exitB);
      if (exitA | exitB) break;
    }
#undef FI_STEP
#undef FI_RF

    A.br.bitbuf = bbA;
    A.br.bitcnt = bcA;
    A.br.p = ipA;
    A.pos = posA;
    B.br.bitbuf = bbB;
    B.br.bitcnt = bcB;
    B.br.p = ipB;
    B.pos = posB;
    if (exitA == -1) A.state = -1;
    if (exitB == -1) B.state = -1;
    if (exitA == 1) A.state = A.bfinal ? 2 : 0;
    if (exitB == 1) B.state = B.bfinal ? 2 : 0;
    if (A.state < 0 || B.state < 0) break;
    // streams that merely left the fast region (tail) are finished by
    // run() below; block-boundary streams loop to prepare()
    if (A.state == 1 && !A.fast_ok()) break;
    if (B.state == 1 && !B.fast_ok()) break;
  }

  *rcA = A.run();
  *rcB = B.run();
}

// legacy single-call raw entry (kept for tests)
inline int inflate_raw(const uint8_t* src, size_t src_n, uint8_t* dst,
                       size_t dst_n) {
  static thread_local InflateStream s;
  s.init(src, src_n, dst, dst_n);
  return s.run();
}

}  // namespace fastinf
