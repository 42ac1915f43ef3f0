// EBCOT Tier-1 + MQ coder fast path (C API for ctypes).
//
// Exact semantic mirror of entropy/ebcot.py + entropy/mq.py (which are the
// behavioral reference, pinned by tests/test_native.py equivalence tests):
// ISO/IEC 15444-1 Annex C MQ coder with OpenJPEG byteout/flush/bypass
// semantics and Annex D stripe-ordered SPP/MRP/CP passes with the full
// code-block style matrix (LAZY/RESET/TERMALL/VSC*/PTERM/SEGSYM).
//
// Build: g++ -O3 -shared -fPIC -o libebcot.so ebcot_native.cpp

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---- MQ tables (ISO Table C.2) ---------------------------------------------
const uint32_t QE[47] = {
    0x5601, 0x3401, 0x1801, 0x0AC1, 0x0521, 0x0221, 0x5601, 0x5401,
    0x4801, 0x3801, 0x3001, 0x2401, 0x1C01, 0x1601, 0x5601, 0x5401,
    0x5101, 0x4801, 0x3801, 0x3401, 0x3001, 0x2801, 0x2401, 0x2201,
    0x1C01, 0x1801, 0x1601, 0x1401, 0x1201, 0x1101, 0x0AC1, 0x09C1,
    0x08A1, 0x0521, 0x0441, 0x02A1, 0x0221, 0x0141, 0x0111, 0x0085,
    0x0049, 0x0025, 0x0015, 0x0009, 0x0005, 0x0001, 0x5601};
const uint8_t NMPS[47] = {1,  2,  3,  4,  5,  38, 7,  8,  9,  10, 11, 12,
                          13, 29, 15, 16, 17, 18, 19, 20, 21, 22, 23, 24,
                          25, 26, 27, 28, 29, 30, 31, 32, 33, 34, 35, 36,
                          37, 38, 39, 40, 41, 42, 43, 44, 45, 45, 46};
const uint8_t NLPS[47] = {1,  6,  9,  12, 29, 33, 6,  14, 14, 14, 17, 18,
                          20, 21, 14, 14, 15, 16, 17, 18, 19, 19, 20, 21,
                          22, 23, 24, 25, 26, 27, 28, 29, 30, 31, 32, 33,
                          34, 35, 36, 37, 38, 39, 40, 41, 42, 43, 46};
const uint8_t SWITCH_[47] = {1, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 0, 0, 0, 1, 0,
                             0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0,
                             0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0};

// context indices
const int CTX_RL = 17, CTX_UNI = 18, NUMCTX = 19;

// style flags
const int S_LAZY = 0x01, S_RESET = 0x02, S_TERMALL = 0x04, S_PTERM = 0x10,
          S_SEGSYM = 0x20;

// flag bits
const int64_t F_SIG = 0x0001, F_REFINE = 0x0002, F_VISIT = 0x0004;
const int64_t F_SIG_N = 0x0010, F_SIG_S = 0x0020, F_SIG_W = 0x0040,
              F_SIG_E = 0x0080, F_SIG_NW = 0x0100, F_SIG_NE = 0x0200,
              F_SIG_SW = 0x0400, F_SIG_SE = 0x0800;
const int64_t F_SIG_NEIGH = F_SIG_N | F_SIG_S | F_SIG_W | F_SIG_E | F_SIG_NW |
                            F_SIG_NE | F_SIG_SW | F_SIG_SE;
const int64_t F_SIGN = 0x1000, F_SIGN_N = 0x2000, F_SIGN_S = 0x4000,
              F_SIGN_W = 0x8000, F_SIGN_E = 0x10000;

// ---- context LUTs (generated from T.800 D.1/D.3 rules like ebcot.py) -------
uint8_t ZC_LUT[4][512];
uint8_t SC_LUT[256];
uint8_t SPB_LUT[256];
bool luts_ready = false;

int zc_context(int h, int v, int d, int orient) {
  if (orient == 1) { int t = h; h = v; v = t; }
  if (orient != 3) {
    if (h == 2) return 8;
    if (h == 1) { if (v >= 1) return 7; return d >= 1 ? 6 : 5; }
    if (v == 2) return 4;
    if (v == 1) return 3;
    return d >= 2 ? 2 : (d == 1 ? 1 : 0);
  }
  int hv = h + v;
  if (d >= 3) return 8;
  if (d == 2) return hv >= 1 ? 7 : 6;
  if (d == 1) return hv >= 2 ? 5 : (hv == 1 ? 4 : 3);
  return hv >= 2 ? 2 : (hv == 1 ? 1 : 0);
}

void build_luts() {
  if (luts_ready) return;
  for (int orient = 0; orient < 4; orient++)
    for (int idx = 0; idx < 512; idx++) {
      int nw = idx & 1, n = (idx >> 1) & 1, ne = (idx >> 2) & 1;
      int w = (idx >> 3) & 1, e = (idx >> 5) & 1;
      int sw = (idx >> 6) & 1, s = (idx >> 7) & 1, se = (idx >> 8) & 1;
      ZC_LUT[orient][idx] =
          (uint8_t)zc_context(w + e, n + s, nw + ne + sw + se, orient);
    }
  // sign coding (T.800 Table D.3)
  const int tbl[3][3][2] = {  // [hc+1][vc+1] -> {ctx, spb}
      {{13, 1}, {12, 1}, {11, 1}},
      {{10, 1}, {9, 0}, {10, 0}},
      {{11, 0}, {12, 0}, {13, 0}}};
  for (int idx = 0; idx < 256; idx++) {
    auto contrib = [](int sig, int neg) { return !sig ? 0 : (neg ? -1 : 1); };
    int w = contrib((idx >> 3) & 1, idx & 1);
    int e = contrib((idx >> 5) & 1, (idx >> 2) & 1);
    int n = contrib((idx >> 1) & 1, (idx >> 4) & 1);
    int s = contrib((idx >> 7) & 1, (idx >> 6) & 1);
    int hc = w + e; if (hc > 1) hc = 1; if (hc < -1) hc = -1;
    int vc = n + s; if (vc > 1) vc = 1; if (vc < -1) vc = -1;
    // table above is indexed [hc+1][vc+1] with the mapping:
    // (1,1)=13/0 (1,0)=12/0 (1,-1)=11/0 (0,1)=10/0 (0,0)=9/0 (0,-1)=10/1
    // (-1,1)=11/1 (-1,0)=12/1 (-1,-1)=13/1
    int ctx, spb;
    if (hc == 1)      { ctx = vc == 1 ? 13 : (vc == 0 ? 12 : 11); spb = 0; }
    else if (hc == 0) { ctx = vc == 0 ? 9 : 10; spb = vc == -1 ? 1 : 0; }
    else              { ctx = vc == 1 ? 11 : (vc == 0 ? 12 : 13); spb = 1; }
    SC_LUT[idx] = (uint8_t)ctx;
    SPB_LUT[idx] = (uint8_t)spb;
    (void)tbl;
  }
  luts_ready = true;
}

inline int sc_index(int64_t f) {
  int idx = 0;
  if (f & F_SIG_W) { idx |= 1 << 3; if (f & F_SIGN_W) idx |= 1; }
  if (f & F_SIG_N) { idx |= 1 << 1; if (f & F_SIGN_N) idx |= 1 << 4; }
  if (f & F_SIG_E) { idx |= 1 << 5; if (f & F_SIGN_E) idx |= 1 << 2; }
  if (f & F_SIG_S) { idx |= 1 << 7; if (f & F_SIGN_S) idx |= 1 << 6; }
  return idx;
}

inline int zc_index(int64_t f) {
  int idx = 0;
  if (f & F_SIG_NW) idx |= 1;
  if (f & F_SIG_N) idx |= 2;
  if (f & F_SIG_NE) idx |= 4;
  if (f & F_SIG_W) idx |= 8;
  if (f & F_SIG_E) idx |= 32;
  if (f & F_SIG_SW) idx |= 64;
  if (f & F_SIG_S) idx |= 128;
  if (f & F_SIG_SE) idx |= 256;
  return idx;
}

inline int mr_context(int64_t f) {
  if (f & F_REFINE) return 16;
  if (f & F_SIG_NEIGH) return 15;
  return 14;
}

// ---- MQ encoder -------------------------------------------------------------
struct MQEnc {
  std::vector<uint8_t> buf;
  int bp = 0;
  uint32_t a = 0x8000, c = 0;
  int ct = 12;
  uint8_t ctx[NUMCTX] = {0};

  MQEnc() { buf.resize(1, 0); }

  void ensure(int idx) { if ((int)buf.size() <= idx) buf.resize(idx + 1, 0); }

  void byteout() {
    ensure(bp);
    if (buf[bp] == 0xFF) {
      bp++; ensure(bp);
      buf[bp] = (c >> 20) & 0xFF; c &= 0xFFFFF; ct = 7; return;
    }
    if ((c & 0x8000000) == 0) {
      bp++; ensure(bp);
      buf[bp] = (c >> 19) & 0xFF; c &= 0x7FFFF; ct = 8; return;
    }
    buf[bp]++;
    if (buf[bp] == 0xFF) {
      c &= 0x7FFFFFF; bp++; ensure(bp);
      buf[bp] = (c >> 20) & 0xFF; c &= 0xFFFFF; ct = 7; return;
    }
    bp++; ensure(bp);
    buf[bp] = (c >> 19) & 0xFF; c &= 0x7FFFF; ct = 8;
  }

  void renorme() {
    while (a < 0x8000) {
      a <<= 1; c <<= 1;
      if (--ct == 0) byteout();
    }
  }

  void encode(int bit, int cx) {
    uint8_t s = ctx[cx];
    int state = s & 0x7F, mps = s >> 7;
    uint32_t qe = QE[state];
    if (bit == mps) {
      a -= qe;
      if ((a & 0x8000) == 0) {
        if (a < qe) a = qe; else c += qe;
        ctx[cx] = NMPS[state] | (mps << 7);
        renorme();
      } else c += qe;
    } else {
      a -= qe;
      if (a < qe) c += qe; else a = qe;
      int nm = SWITCH_[state] ? 1 - mps : mps;
      ctx[cx] = NLPS[state] | (nm << 7);
      renorme();
    }
  }

  void setbits() {
    uint32_t tmp = c + a;
    c |= 0xFFFF;
    if (c >= tmp) c -= 0x8000;
  }

  void flush() {
    setbits();
    c <<= ct; byteout();
    c <<= ct; byteout();
    ensure(bp);
    if (buf[bp] != 0xFF) bp++;
  }

  void erterm() {
    int k = 11 - ct + 1;
    while (k > 0) { c <<= ct; ct = 0; byteout(); k -= ct; }
    ensure(bp);
    if (buf[bp] != 0xFF) byteout();
  }

  void restart_init() {
    a = 0x8000; c = 0; ct = 12;
    if (bp > 0) bp--;
    ensure(bp);
    if (buf[bp] == 0xFF) ct = 13;
  }

  // bypass
  int raw_ct = -1;
  void bypass_init() { c = 0; raw_ct = -1; }
  void bypass_encode(int bit) {
    if (raw_ct == -1) raw_ct = 8;
    raw_ct--;
    c += (uint32_t)bit << raw_ct;
    if (raw_ct == 0) {
      ensure(bp);
      buf[bp] = c & 0xFF;
      raw_ct = (buf[bp] == 0xFF) ? 7 : 8;
      bp++; c = 0;
    }
  }
  void bypass_flush(bool ert) {
    if (raw_ct == -1) return;  // no raw bits written
    int ct2 = raw_ct;
    if (ct2 < 7 || (ct2 == 7 && (ert || (bp > 0 && buf[bp - 1] != 0xFF)))) {
      int bit = 0;
      while (ct2 > 0) { ct2--; c += (uint32_t)bit << ct2; bit = 1 - bit; }
      ensure(bp);
      buf[bp] = c & 0xFF; bp++;
    } else if (ct2 == 7 && bp > 0 && buf[bp - 1] == 0xFF) {
      if (!ert) bp--;
    } else if (ct2 == 8 && !ert && bp > 1 && buf[bp - 1] == 0x7F &&
               buf[bp - 2] == 0xFF) {
      bp -= 2;
    }
    raw_ct = ct2;
  }
  int num_bytes() const { return bp > 1 ? bp - 1 : 0; }
};

// ---- MQ decoder --------------------------------------------------------------
struct MQDec {
  const uint8_t* data;
  int datalen, bp = 0;
  uint32_t a = 0x8000, c = 0;
  int ct = 0;
  uint8_t ctx[NUMCTX] = {0};
  uint8_t sentinel[2] = {0xFF, 0xFF};
  std::vector<uint8_t> owned;

  void init(const uint8_t* d, int n, const uint8_t* inherit) {
    owned.assign(d, d + n);
    owned.push_back(0xFF); owned.push_back(0xFF);
    data = owned.data(); datalen = n; bp = 0; a = 0x8000; c = 0; ct = 0;
    if (inherit) memcpy(ctx, inherit, NUMCTX);
    else memset(ctx, 0, NUMCTX);
    c = (datalen == 0 ? 0xFFu : (uint32_t)data[0]) << 16;
    bytein();
    c <<= 7; ct -= 7; a = 0x8000;
  }

  void bytein() {
    uint8_t nxt = data[bp + 1];
    if (data[bp] == 0xFF) {
      if (nxt > 0x8F) { c += 0xFF00; ct = 8; }
      else { bp++; c += (uint32_t)nxt << 9; ct = 7; }
    } else { bp++; c += (uint32_t)nxt << 8; ct = 8; }
  }

  void renormd() {
    while (a < 0x8000) {
      if (ct == 0) bytein();
      a <<= 1; c <<= 1; ct--;
    }
  }

  int decode(int cx) {
    uint8_t s = ctx[cx];
    int state = s & 0x7F, mps = s >> 7, d;
    uint32_t qe = QE[state];
    a -= qe;
    if ((c >> 16) < qe) {
      if (a < qe) { a = qe; d = mps; ctx[cx] = NMPS[state] | (mps << 7); }
      else {
        a = qe; d = 1 - mps;
        int nm = SWITCH_[state] ? 1 - mps : mps;
        ctx[cx] = NLPS[state] | (nm << 7);
      }
      renormd();
    } else {
      c -= qe << 16;
      if (a & 0x8000) return mps;
      if (a < qe) {
        d = 1 - mps;
        int nm = SWITCH_[state] ? 1 - mps : mps;
        ctx[cx] = NLPS[state] | (nm << 7);
      } else { d = mps; ctx[cx] = NMPS[state] | (mps << 7); }
      renormd();
    }
    return d;
  }
};

struct RawDec {
  std::vector<uint8_t> owned;
  const uint8_t* data;
  int bp = 0;
  uint32_t c = 0;
  int ct = 0;
  void init(const uint8_t* d, int n) {
    owned.assign(d, d + n);
    owned.push_back(0xFF); owned.push_back(0xFF);
    data = owned.data(); bp = 0; c = 0; ct = 0;
  }
  int decode() {
    if (ct == 0) {
      if (c == 0xFF) {
        uint8_t nxt = data[bp];
        if (nxt > 0x8F) { c = 0xFF; ct = 8; }
        else { c = nxt; bp++; ct = 7; }
      } else { c = data[bp]; bp++; ct = 8; }
    }
    ct--;
    return (c >> ct) & 1;
  }
};

// ---- pass helpers -------------------------------------------------------------
inline bool lazy_raw(int bp_, int maxbp, int pt, int style) {
  if (!(style & S_LAZY) || pt >= 2) return false;
  return bp_ < maxbp - 3;
}
inline bool terminating(int bp_, int maxbp, int pt, int style) {
  if (pt == 2 && bp_ == 0) return true;
  if (style & S_TERMALL) return true;
  if (style & S_LAZY) {
    if (bp_ == maxbp - 3 && pt == 2) return true;
    if (bp_ < maxbp - 3 && pt > 0) return true;
  }
  return false;
}

struct T1 {
  int w, h, pw, style, orient;
  std::vector<int64_t> flags, data;

  T1(int w_, int h_, int style_, int orient_)
      : w(w_), h(h_), pw(w_ + 2), style(style_), orient(orient_) {
    flags.assign((size_t)(h + 2) * pw, 0);
    data.assign((size_t)(h + 2) * pw, 0);
  }

  inline void update_neighbors(int x, int y, int idx) {
    int64_t sign = flags[idx] & F_SIGN;
    int nn = y * pw + x + 1, ss = (y + 2) * pw + x + 1;
    int ww = (y + 1) * pw + x, ee = (y + 1) * pw + x + 2;
    flags[nn] |= F_SIG_S; flags[ss] |= F_SIG_N;
    flags[ww] |= F_SIG_E; flags[ee] |= F_SIG_W;
    if (sign) {
      flags[nn] |= F_SIGN_S; flags[ss] |= F_SIGN_N;
      flags[ww] |= F_SIGN_E; flags[ee] |= F_SIGN_W;
    }
    flags[y * pw + x] |= F_SIG_SE;
    flags[y * pw + x + 2] |= F_SIG_SW;
    flags[(y + 2) * pw + x] |= F_SIG_NE;
    flags[(y + 2) * pw + x + 2] |= F_SIG_NW;
  }
};

}  // namespace

extern "C" {

// Encode one code-block. Returns stream length, or -1 on error.
// out_* arrays must have capacity >= max_passes.
int t1_encode(const int64_t* src, int w, int h, int style, int orient,
              int roishift, uint8_t* out, int out_cap, int* numbps_out,
              int* npasses_out, int* pass_rates, uint8_t* pass_terms,
              int* pass_bitplanes, int max_passes) {
  build_luts();
  T1 t(w, h, style, orient);
  int64_t maxabs = 0;
  for (int y = 0; y < h; y++)
    for (int x = 0; x < w; x++) {
      int64_t v = src[y * w + x];
      t.data[(y + 1) * t.pw + x + 1] = v;
      int64_t av = v < 0 ? -v : v;
      if (av > maxabs) maxabs = av;
    }
  int numbps = 0;
  while (maxabs > 0) { numbps++; maxabs >>= 1; }
  MQEnc mq;
  if (numbps == 0) {
    mq.flush();
    *numbps_out = 0; *npasses_out = 0;
    int n = mq.num_bytes();
    if (n > out_cap) return -1;
    memcpy(out, mq.buf.data() + 1, n);
    return n;
  }
  int maxbp = numbps - 1;
  mq.ctx[CTX_UNI] = 46; mq.ctx[CTX_RL] = 3; mq.ctx[0] = 4;

  int pass_type = 2, bitplane = maxbp, pass_idx = 0;
  bool prev_term = false;
  auto& flags = t.flags;
  auto& data = t.data;
  int pw = t.pw;
  const uint8_t* zc = ZC_LUT[orient];

  while (bitplane >= 0 && pass_idx < max_passes) {
    if (pass_type == 0 || (pass_type == 2 && pass_idx == 0)) {
      for (auto& f : flags) f &= ~F_VISIT;
      if (roishift > 0 && bitplane >= roishift) {
        pass_type = 0; bitplane--; continue;
      }
    }
    bool raw = lazy_raw(bitplane, maxbp, pass_type, style);
    if (prev_term) {
      if (raw) mq.bypass_init(); else mq.restart_init();
      prev_term = false;
    }

    if (pass_type == 0) {  // SPP
      for (int k = 0; k < h; k += 4)
        for (int x = 0; x < w; x++)
          for (int y = k; y < k + 4 && y < h; y++) {
            int idx = (y + 1) * pw + x + 1;
            int64_t f = flags[idx];
            if ((f & F_SIG) || !(f & F_SIG_NEIGH)) continue;
            int64_t v = data[idx];
            int64_t av = v < 0 ? -v : v;
            int sig = (int)((av >> bitplane) & 1);
            if (raw) mq.bypass_encode(sig);
            else mq.encode(sig, zc[zc_index(f)]);
            flags[idx] |= F_VISIT;
            if (sig) {
              int sign = v < 0;
              if (sign) flags[idx] |= F_SIGN;
              if (raw) mq.bypass_encode(sign);
              else {
                int si = sc_index(f);
                mq.encode(sign ^ SPB_LUT[si], SC_LUT[si]);
              }
              flags[idx] |= F_SIG;
              t.update_neighbors(x, y, idx);
            }
          }
    } else if (pass_type == 1) {  // MRP
      for (int k = 0; k < h; k += 4)
        for (int x = 0; x < w; x++)
          for (int y = k; y < k + 4 && y < h; y++) {
            int idx = (y + 1) * pw + x + 1;
            int64_t f = flags[idx];
            if (!(f & F_SIG) || (f & F_VISIT)) continue;
            int64_t v = data[idx];
            int64_t av = v < 0 ? -v : v;
            int bit = (int)((av >> bitplane) & 1);
            if (raw) mq.bypass_encode(bit);
            else mq.encode(bit, mr_context(f));
            flags[idx] |= F_REFINE;
          }
    } else {  // CP
      for (int k = 0; k < h; k += 4)
        for (int x = 0; x < w; x++) {
          bool handled = false;
          if (k + 3 < h) {
            bool can_rl = true;
            int rl_pos = -1;
            for (int dy = 0; dy < 4; dy++) {
              int idx = (k + dy + 1) * pw + x + 1;
              int64_t f = flags[idx];
              if ((f & (F_VISIT | F_SIG)) || (f & F_SIG_NEIGH)) {
                can_rl = false; break;
              }
              if (rl_pos < 0) {
                int64_t v = data[idx];
                int64_t av = v < 0 ? -v : v;
                if ((av >> bitplane) & 1) rl_pos = dy;
              }
            }
            if (can_rl) {
              handled = true;
              mq.encode(rl_pos >= 0 ? 1 : 0, CTX_RL);
              if (rl_pos >= 0) {
                mq.encode((rl_pos >> 1) & 1, CTX_UNI);
                mq.encode(rl_pos & 1, CTX_UNI);
                bool partial = true;
                for (int dy = rl_pos; dy < 4; dy++) {
                  int y = k + dy;
                  int idx = (y + 1) * pw + x + 1;
                  int64_t f = flags[idx];
                  if (f & (F_VISIT | F_SIG)) { flags[idx] &= ~F_VISIT; continue; }
                  int64_t v = data[idx];
                  int64_t av = v < 0 ? -v : v;
                  int sig;
                  if (partial) { sig = 1; partial = false; }
                  else {
                    sig = (int)((av >> bitplane) & 1);
                    mq.encode(sig, zc[zc_index(f)]);
                  }
                  if (sig) {
                    int sign = v < 0;
                    if (sign) flags[idx] |= F_SIGN;
                    int si = sc_index(f);
                    mq.encode(sign ^ SPB_LUT[si], SC_LUT[si]);
                    flags[idx] |= F_SIG;
                    t.update_neighbors(x, y, idx);
                  }
                  flags[idx] &= ~F_VISIT;
                }
              }
            }
          }
          if (!handled) {
            for (int y = k; y < k + 4 && y < h; y++) {
              int idx = (y + 1) * pw + x + 1;
              int64_t f = flags[idx];
              if (f & (F_VISIT | F_SIG)) { flags[idx] &= ~F_VISIT; continue; }
              int64_t v = data[idx];
              int64_t av = v < 0 ? -v : v;
              int sig = (int)((av >> bitplane) & 1);
              mq.encode(sig, zc[zc_index(f)]);
              if (sig) {
                int sign = v < 0;
                if (sign) flags[idx] |= F_SIGN;
                int si = sc_index(f);
                mq.encode(sign ^ SPB_LUT[si], SC_LUT[si]);
                flags[idx] |= F_SIG;
                t.update_neighbors(x, y, idx);
              }
              flags[idx] &= ~F_VISIT;
            }
          }
        }
      if (style & S_SEGSYM) {
        mq.encode(1, CTX_UNI); mq.encode(0, CTX_UNI);
        mq.encode(1, CTX_UNI); mq.encode(0, CTX_UNI);
      }
    }

    bool term = terminating(bitplane, maxbp, pass_type, style);
    if (term) {
      if (raw) mq.bypass_flush(style & S_PTERM);
      else if (style & S_PTERM) mq.erterm();
      else mq.flush();
      prev_term = true;
    }
    pass_rates[pass_idx] = mq.num_bytes();
    pass_terms[pass_idx] = term ? 1 : 0;
    pass_bitplanes[pass_idx] = bitplane;

    if (style & S_RESET) {
      memset(mq.ctx, 0, NUMCTX);
      mq.ctx[CTX_UNI] = 46; mq.ctx[CTX_RL] = 3; mq.ctx[0] = 4;
    }
    pass_idx++;
    if (pass_type == 2) { pass_type = 0; bitplane--; } else pass_type++;
  }

  if (!prev_term) mq.flush();
  int n = mq.num_bytes();
  if (pass_idx > 0) {
    pass_rates[pass_idx - 1] = n;
    pass_terms[pass_idx - 1] = 1;
  }
  *numbps_out = numbps;
  *npasses_out = pass_idx;
  if (n > out_cap) return -1;
  memcpy(out, mq.buf.data() + 1, n);
  return n;
}

// Decode one code-block into out (int64 [h*w]). Returns 0, or -1 on error.
int t1_decode(const uint8_t* stream, int stream_len, int w, int h, int style,
              int orient, int num_passes, int numbps, int roishift,
              const int32_t* seg_ends, int n_segs, int64_t* out_data) {
  build_luts();
  T1 t(w, h, style, orient);
  if (numbps <= 0 || num_passes <= 0) {
    memset(out_data, 0, sizeof(int64_t) * (size_t)w * h);
    return 0;
  }
  int maxbp = numbps - 1;

  // termination pattern
  std::vector<uint8_t> term(num_passes, 0);
  {
    int pt = 2, bp_ = maxbp;
    for (int i = 0; i < num_passes; i++) {
      term[i] = terminating(bp_, maxbp, pt, style) ? 1 : 0;
      if (pt == 2) { pt = 0; bp_--; } else pt++;
    }
  }
  bool use_segs = n_segs > 0;
  {
    bool any_mid = false;
    for (int i = 0; i + 1 < num_passes; i++) if (term[i]) any_mid = true;
    use_segs = use_segs && any_mid;
  }

  MQDec mq;
  RawDec rd;
  bool is_raw_active = false;
  uint8_t saved_ctx[NUMCTX];
  bool have_ctx = false;
  int seg_idx = 0, seg_start = 0;
  const uint8_t* seg_ptr = stream;
  int seg_len = stream_len;
  if (use_segs) {
    int end = seg_ends[0];
    if (end > stream_len) end = stream_len;
    seg_ptr = stream; seg_len = end; seg_start = end;
  }

  bool need_new = true;
  int pass_type = 2, bitplane = maxbp, pass_idx = 0;
  auto& flags = t.flags;
  auto& data = t.data;
  int pw = t.pw;
  const uint8_t* zc = ZC_LUT[orient];

  auto recon_sig = [&](int bp_, int sign) -> int64_t {
    int64_t v = (int64_t)1 << bp_;
    return sign ? -v : v;
  };
  auto recon_ref = [&](int64_t cur, int bp_, int bit) -> int64_t {
    if (!bit) return cur;
    return cur >= 0 ? cur + ((int64_t)1 << bp_) : cur - ((int64_t)1 << bp_);
  };

  while (bitplane >= 0 && pass_idx < num_passes) {
    if (pass_type == 0 || (pass_type == 2 && pass_idx == 0)) {
      for (auto& f : flags) f &= ~F_VISIT;
      if (roishift > 0 && bitplane >= roishift) {
        pass_type = 0; bitplane--; continue;
      }
    }
    bool raw = lazy_raw(bitplane, maxbp, pass_type, style);
    if (need_new) {
      if (raw) { rd.init(seg_ptr, seg_len); is_raw_active = true; }
      else {
        bool reset = (style & S_RESET) != 0;
        mq.init(seg_ptr, seg_len, (!have_ctx || reset) ? nullptr : saved_ctx);
        if (!have_ctx || reset) {
          mq.ctx[CTX_UNI] = 46; mq.ctx[CTX_RL] = 3; mq.ctx[0] = 4;
        }
        is_raw_active = false;
      }
      need_new = false;
    }

    if (pass_type == 0) {
      for (int k = 0; k < h; k += 4)
        for (int x = 0; x < w; x++)
          for (int y = k; y < k + 4 && y < h; y++) {
            int idx = (y + 1) * pw + x + 1;
            int64_t f = flags[idx];
            if ((f & F_SIG) || !(f & F_SIG_NEIGH)) continue;
            int sig = raw ? rd.decode() : mq.decode(zc[zc_index(f)]);
            flags[idx] |= F_VISIT;
            if (sig) {
              int sign;
              if (raw) sign = rd.decode();
              else {
                int si = sc_index(f);
                sign = mq.decode(SC_LUT[si]) ^ SPB_LUT[si];
              }
              if (sign) flags[idx] |= F_SIGN;
              data[idx] = recon_sig(bitplane, sign);
              flags[idx] |= F_SIG;
              t.update_neighbors(x, y, idx);
            }
          }
    } else if (pass_type == 1) {
      for (int k = 0; k < h; k += 4)
        for (int x = 0; x < w; x++)
          for (int y = k; y < k + 4 && y < h; y++) {
            int idx = (y + 1) * pw + x + 1;
            int64_t f = flags[idx];
            if (!(f & F_SIG) || (f & F_VISIT)) continue;
            int bit = raw ? rd.decode() : mq.decode(mr_context(f));
            data[idx] = recon_ref(data[idx], bitplane, bit);
            flags[idx] |= F_REFINE;
          }
    } else {
      for (int k = 0; k < h; k += 4)
        for (int x = 0; x < w; x++) {
          bool handled = false;
          if (k + 3 < h) {
            bool can_rl = true;
            for (int dy = 0; dy < 4; dy++) {
              int idx = (k + dy + 1) * pw + x + 1;
              int64_t f = flags[idx];
              if ((f & (F_VISIT | F_SIG)) || (f & F_SIG_NEIGH)) {
                can_rl = false; break;
              }
            }
            if (can_rl) {
              handled = true;
              if (mq.decode(CTX_RL)) {
                int rl_pos = (mq.decode(CTX_UNI) << 1) | mq.decode(CTX_UNI);
                bool partial = true;
                for (int dy = rl_pos; dy < 4; dy++) {
                  int y = k + dy;
                  int idx = (y + 1) * pw + x + 1;
                  int64_t f = flags[idx];
                  if (f & (F_VISIT | F_SIG)) { flags[idx] &= ~F_VISIT; continue; }
                  int sig;
                  if (partial) { sig = 1; partial = false; }
                  else sig = mq.decode(zc[zc_index(f)]);
                  if (sig) {
                    int si = sc_index(f);
                    int sign = mq.decode(SC_LUT[si]) ^ SPB_LUT[si];
                    if (sign) flags[idx] |= F_SIGN;
                    data[idx] = recon_sig(bitplane, sign);
                    flags[idx] |= F_SIG;
                    t.update_neighbors(x, y, idx);
                  }
                  flags[idx] &= ~F_VISIT;
                }
              }
            }
          }
          if (!handled) {
            for (int y = k; y < k + 4 && y < h; y++) {
              int idx = (y + 1) * pw + x + 1;
              int64_t f = flags[idx];
              if (f & (F_VISIT | F_SIG)) { flags[idx] &= ~F_VISIT; continue; }
              int sig = mq.decode(zc[zc_index(f)]);
              if (sig) {
                int si = sc_index(f);
                int sign = mq.decode(SC_LUT[si]) ^ SPB_LUT[si];
                if (sign) flags[idx] |= F_SIGN;
                data[idx] = recon_sig(bitplane, sign);
                flags[idx] |= F_SIG;
                t.update_neighbors(x, y, idx);
              }
              flags[idx] &= ~F_VISIT;
            }
          }
        }
      if (style & S_SEGSYM)
        for (int i = 0; i < 4; i++) mq.decode(CTX_UNI);
    }

    if (style & S_RESET) {
      if (!is_raw_active) {
        memset(mq.ctx, 0, NUMCTX);
        mq.ctx[CTX_UNI] = 46; mq.ctx[CTX_RL] = 3; mq.ctx[0] = 4;
      }
      have_ctx = false;
    } else if (!is_raw_active) {
      memcpy(saved_ctx, mq.ctx, NUMCTX);
      have_ctx = true;
    }

    if (term[pass_idx] && pass_idx + 1 < num_passes) {
      if (use_segs) {
        seg_idx++;
        if (seg_idx < n_segs) {
          int end = seg_ends[seg_idx];
          if (end > stream_len) end = stream_len;
          seg_ptr = stream + seg_start;
          seg_len = end - seg_start;
          if (seg_len < 0) seg_len = 0;
          seg_start = end;
        } else { seg_ptr = stream; seg_len = 0; }
      }
      need_new = true;
    }

    pass_idx++;
    if (pass_type == 2) { pass_type = 0; bitplane--; } else pass_type++;
  }

  for (int y = 0; y < h; y++)
    memcpy(out_data + (size_t)y * w, &data[(size_t)(y + 1) * pw + 1],
           sizeof(int64_t) * w);
  return 0;
}

}  // extern "C"
