// Native tile packer: od_ec range encoder + AV1 coefficient syntax.
//
// Reference parity: the serial entropy half of rav1e's encode_tile
// (src/ec.rs WriterEncoder + src/encoder.rs encode_tx_block), built as
// a C library driven from Python via ctypes (SURVEY §7.2 Plan A: host
// packer overlapped with TPU compute).
//
// Semantics are kept byte-identical to the validated Python writer
// (rav1e_tpu/entropy/{ec,coeffs}.py); tests assert equality.
//
// Build: g++ -O2 -shared -fPIC -o libpacker.so packer.cpp

#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <vector>

namespace {

constexpr int PROB_TOP = 1 << 15;
constexpr int EC_PROB_SHIFT = 6;
constexpr int EC_MIN_PROB = 4;

struct Cdf {
  uint16_t v[17];  // values + terminator 0; counter separate
  uint16_t count;
  uint8_t n;  // number of symbols
};

struct Encoder {
  // interval state
  uint64_t low = 0;
  uint32_t rng = PROB_TOP;
  int64_t nbits = 15;
  int64_t flushed = 0;
  std::vector<uint32_t> precarry;

  void norm() {
    uint32_t r = rng;
    int d = 0;
    while (r < (1u << 15)) { r <<= 1; d++; }
    if (d > 0) {
      low <<= d;
      rng = r;
      nbits += d;
    }
    while (nbits - flushed >= 24) {
      int64_t keep = nbits - flushed - 8;
      precarry.push_back((uint32_t)(low >> keep));
      low &= (1ull << keep) - 1;
      flushed += 8;
    }
  }

  static inline uint32_t scale(uint32_t r, uint32_t f) {
    return ((r >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT);
  }

  void symbol_raw(int s, const uint16_t* icdf, int n) {
    uint32_t r = rng;
    int N = n - 1;
    uint32_t fl = (s == 0) ? PROB_TOP : icdf[s - 1];
    uint32_t fh = icdf[s];
    if (fl < PROB_TOP) {
      uint32_t u = scale(r, fl) + EC_MIN_PROB * (N - (s - 1));
      uint32_t v = scale(r, fh) + EC_MIN_PROB * (N - s);
      low += r - u;
      rng = u - v;
    } else {
      uint32_t v = scale(r, fh) + EC_MIN_PROB * (N - s);
      rng = r - v;
    }
    norm();
  }

  void symbol(int s, Cdf& c) {
    symbol_raw(s, c.v, c.n);
    // spec CDF adaptation
    int n = c.n;
    uint16_t count = c.count;
    int rate = 3 + (count > 15) + (count > 31) +
               ((n == 2 || n == 3) ? 1 : 2);
    for (int i = 0; i < n - 1; i++) {
      if (i < s)
        c.v[i] += (PROB_TOP - c.v[i]) >> rate;
      else
        c.v[i] -= c.v[i] >> rate;
    }
    c.count = count + (count < 32);
  }

  void boolean(int val, uint32_t f) {
    uint32_t r = rng;
    uint32_t v = scale(r, f) + EC_MIN_PROB;
    if (val) {
      low += r - v;
      rng = v;
    } else {
      rng = r - v;
    }
    norm();
  }

  void literal(uint32_t value, int n) {
    for (int i = n - 1; i >= 0; i--) boolean((value >> i) & 1, 1 << 14);
  }

  void golomb(uint32_t value) {
    uint32_t x = value + 1;
    int length = 32 - __builtin_clz(x);
    for (int i = 0; i < length - 1; i++) boolean(0, 1 << 14);
    for (int b = length - 1; b >= 0; b--) boolean((x >> b) & 1, 1 << 14);
  }

  size_t done(uint8_t* out, size_t cap) {
    uint64_t m = (1 << 14) - 1;
    uint64_t e = ((low + m) & ~m) | (m + 1);
    int64_t window = nbits - flushed;
    std::vector<uint32_t> chunks(precarry);
    while (window > 0) {
      int64_t take = window >= 8 ? window - 8 : 0;
      chunks.push_back((uint32_t)(e >> take));
      e &= (1ull << take) - 1;
      window = take;
    }
    size_t nb = chunks.size();
    if (nb > cap) return 0;
    uint32_t carry = 0;
    std::vector<uint8_t> bytes(nb);
    for (size_t i = nb; i-- > 0;) {
      uint32_t s = chunks[i] + carry;
      bytes[i] = s & 0xFF;
      carry = s >> 8;
    }
    int rem = (int)(nbits % 8);
    if (rem) bytes[nb - 1] = (uint8_t)((bytes[nb - 1] << (8 - rem)) & 0xFF);
    memcpy(out, bytes.data(), nb);
    return nb;
  }
};

// ---- coefficient coding ---------------------------------------------------

constexpr int NUM_BASE_LEVELS = 2;
constexpr int COEFF_BASE_RANGE = 12;

enum TxClass { C2D = 0, CHORIZ = 1, CVERT = 2 };

const int LO_SQ[5][5] = {{0, 1, 6, 6, 21},
                         {1, 6, 6, 21, 21},
                         {6, 6, 21, 21, 21},
                         {6, 21, 21, 21, 21},
                         {21, 21, 21, 21, 21}};
const int LO_TALL[5][5] = {{0, 16, 6, 6, 21},
                           {16, 16, 6, 21, 21},
                           {16, 16, 21, 21, 21},
                           {16, 16, 21, 21, 21},
                           {16, 16, 21, 21, 21}};
const int LO_WIDE[5][5] = {{0, 11, 11, 11, 21},
                           {11, 11, 11, 11, 21},
                           {6, 6, 21, 21, 21},
                           {6, 21, 21, 21, 21},
                           {21, 21, 21, 21, 21}};

struct Packer {
  Encoder ec;
  std::vector<std::vector<Cdf>> fams;
  Cdf& fams_at(int fam, int rec) { return fams[fam][rec]; }
  void symbol_fam(int fam, int rec, int sym) { ec.symbol(sym, fams[fam][rec]); }
};

static inline int imin(int a, int b) { return a < b ? a : b; }

void scan_pos(int w, int h, int tclass, std::vector<int>& out) {
  out.clear();
  out.reserve(w * h);
  if (tclass == C2D) {
    for (int d = 0; d < w + h - 1; d++) {
      int lo = d - w + 1;
      if (lo < 0) lo = 0;
      int hi = imin(d, h - 1);
      if (d % 2 == 0) {
        for (int r = hi; r >= lo; r--) out.push_back(r * w + (d - r));
      } else {
        for (int r = lo; r <= hi; r++) out.push_back(r * w + (d - r));
      }
    }
  } else if (tclass == CVERT) {
    for (int c = 0; c < w; c++)
      for (int r = 0; r < h; r++) out.push_back(r * w + c);
  } else {
    for (int r = 0; r < h; r++)
      for (int c = 0; c < w; c++) out.push_back(r * w + c);
  }
}

int base_ctx(const int32_t* lv, int w, int h, int r, int c, int tclass,
             const int (*off)[5]) {
  int mag = 0;
  auto add = [&](int rr, int cc, int cap) {
    if (rr < h && cc < w) {
      int v = lv[rr * w + cc];
      if (v < 0) v = -v;
      mag += v < cap ? v : cap;
    }
  };
  if (tclass == C2D) {
    if (r == 0 && c == 0) return 0;
    add(r, c + 1, 3);
    add(r + 1, c, 3);
    add(r + 1, c + 1, 3);
    add(r, c + 2, 3);
    add(r + 2, c, 3);
  } else if (tclass == CVERT) {
    add(r, c + 1, 3);
    add(r + 1, c, 3);
    add(r + 2, c, 3);
    add(r + 3, c, 3);
    add(r + 4, c, 3);
  } else {
    add(r, c + 1, 3);
    add(r + 1, c, 3);
    add(r, c + 2, 3);
    add(r, c + 3, 3);
    add(r, c + 4, 3);
  }
  mag = imin((mag + 1) >> 1, 4);
  if (tclass == C2D) return mag + off[imin(r, 4)][imin(c, 4)];
  int pos = (tclass == CVERT) ? r : c;
  int off1d = pos == 0 ? 0 : (pos == 1 ? 7 : 14);
  return mag + off1d;
}

int br_ctx_f(const int32_t* lv, int w, int h, int r, int c, int tclass) {
  int mag = 0;
  auto add = [&](int rr, int cc) {
    if (rr < h && cc < w) {
      int v = lv[rr * w + cc];
      if (v < 0) v = -v;
      mag += v < 15 ? v : 15;
    }
  };
  add(r, c + 1);
  add(r + 1, c);
  if (tclass == C2D)
    add(r + 1, c + 1);
  else if (tclass == CVERT)
    add(r + 2, c);
  else
    add(r, c + 2);
  mag = imin((mag + 1) >> 1, 6);
  if (tclass == C2D) {
    if (r == 0 && c == 0) return mag;
    if (r < 2 && c < 2) return mag + 7;
    return mag + 14;
  }
  int pos = (tclass == CVERT) ? r : c;
  return pos == 0 ? mag : mag + 14;
}

}  // namespace

extern "C" {

void* packer_new() { return new Packer(); }
void packer_free(void* h) { delete (Packer*)h; }

// register a CDF family: data = int32 [n_records][nsym] (values incl
// trailing 0 terminator). Returns family id.
int packer_add_family(void* h, const int32_t* data, int n_records,
                      int nsym) {
  Packer* p = (Packer*)h;
  std::vector<Cdf> recs(n_records);
  for (int i = 0; i < n_records; i++) {
    Cdf& c = recs[i];
    c.n = (uint8_t)nsym;
    c.count = 0;
    for (int k = 0; k < nsym; k++) c.v[k] = (uint16_t)data[i * nsym + k];
  }
  p->fams.push_back(std::move(recs));
  return (int)p->fams.size() - 1;
}

void packer_symbol(void* h, int fam, int rec, int sym) {
  Packer* p = (Packer*)h;
  p->ec.symbol(sym, p->fams_at(fam, rec));
}

void packer_symbol_noadapt_raw(void* h, int sym, const int32_t* icdf,
                               int nsym) {
  Packer* p = (Packer*)h;
  uint16_t v[17];
  for (int i = 0; i < nsym; i++) v[i] = (uint16_t)icdf[i];
  p->ec.symbol_raw(sym, v, nsym);
}

void packer_bool(void* h, int val, int f) {
  ((Packer*)h)->ec.boolean(val, (uint32_t)f);
}

void packer_literal(void* h, int val, int n) {
  ((Packer*)h)->ec.literal((uint32_t)val, n);
}

// Coefficients for one TU. levels: int32 [h][w] row-major (full tx
// dims; only min(32) area is scanned). fam ids must be registered in
// the canonical order (see python side). Returns cul context byte.
int packer_coeffs(void* h, int ptype, int txw, int txh, int tctx,
                  int br_tctx, int tclass, int eob_fam, int eob_rec,
                  int hi_fam, int hi_rec_base, int skip_fam, int skip_rec, int beob_fam,
                  int beob_rec_base, int base_fam, int base_rec_base,
                  int br_fam, int br_rec_base, int dc_fam, int dc_rec,
                  int txtype_fam, int txtype_rec, int txtype_sym,
                  const int32_t* levels) {
  Packer* p = (Packer*)h;
  Encoder& ec = p->ec;
  int sw = imin(txw, 32), sh = imin(txh, 32);
  std::vector<int> scan;
  scan_pos(sw, sh, tclass, scan);
  std::vector<int32_t> lv(sw * sh);
  for (int r = 0; r < sh; r++)
    for (int c = 0; c < sw; c++) {
      int32_t v = levels[r * txw + c];
      lv[r * sw + c] = v < 0 ? -v : v;
    }
  int eob = 0;
  for (int ci = sw * sh - 1; ci >= 0; ci--) {
    if (lv[scan[ci]] != 0) {
      eob = ci + 1;
      break;
    }
  }
  p->symbol_fam(skip_fam, skip_rec, eob == 0 ? 1 : 0);
  if (eob == 0) return 0;
  if (txtype_fam >= 0) p->symbol_fam(txtype_fam, txtype_rec, txtype_sym);
  // eob_pt
  int pt;
  if (eob == 1)
    pt = 0;
  else {
    pt = 32 - __builtin_clz((unsigned)(eob - 1));
  }
  p->symbol_fam(eob_fam, eob_rec, pt);
  if (pt >= 2) {
    int start = (1 << (pt - 1)) + 1;
    int ofs = eob - start;
    int nbits2 = pt - 1;
    p->symbol_fam(hi_fam, hi_rec_base + pt, (ofs >> (nbits2 - 1)) & 1);
    for (int b = nbits2 - 2; b >= 0; b--) ec.boolean((ofs >> b) & 1, 1 << 14);
  }
  const int(*off)[5] = LO_SQ;
  if (sh == 2 * sw)
    off = LO_TALL;
  else if (sw == 2 * sh)
    off = LO_WIDE;
  int n_pels = sw * sh;
  for (int ci = eob - 1; ci >= 0; ci--) {
    int pos = scan[ci];
    int r = pos / sw, c = pos % sw;
    int level = lv[pos];
    if (ci == eob - 1) {
      int ectx;
      if (ci == 0)
        ectx = 0;
      else if (ci <= (n_pels >> 3))
        ectx = 1;
      else if (ci <= (n_pels >> 2))
        ectx = 2;
      else
        ectx = 3;
      p->symbol_fam(beob_fam, beob_rec_base + ectx, imin(level, 3) - 1);
    } else {
      int bctx = base_ctx(lv.data(), sw, sh, r, c, tclass, off);
      p->symbol_fam(base_fam, base_rec_base + bctx, imin(level, 3));
    }
    if (level > NUM_BASE_LEVELS) {
      int bctx = br_ctx_f(lv.data(), sw, sh, r, c, tclass);
      int base_range = level - 1 - NUM_BASE_LEVELS;
      for (int idx = 0; idx < COEFF_BASE_RANGE; idx += 3) {
        int k = imin(base_range - idx, 3);
        p->symbol_fam(br_fam, br_rec_base + bctx, k);
        if (k < 3) break;
      }
    }
  }
  // signs + golomb, forward
  int cul = 0, dc_cat = 0;
  for (int ci = 0; ci < eob; ci++) {
    int pos = scan[ci];
    int r = pos / sw, c = pos % sw;
    int level = lv[pos];
    if (level == 0) continue;
    int sign = levels[r * txw + c] < 0 ? 1 : 0;
    if (pos == 0) {
      p->symbol_fam(dc_fam, dc_rec, sign);
      dc_cat = sign ? 1 : 2;
    } else {
      ec.boolean(sign, 1 << 14);
    }
    if (level > COEFF_BASE_RANGE + NUM_BASE_LEVELS)
      ec.golomb(level - COEFF_BASE_RANGE - NUM_BASE_LEVELS - 1);
    cul += level;
  }
  if (cul > 63) cul = 63;
  return cul | (dc_cat << 6);
}

void packer_split_bool(void* h, int fam, int rec, int bit,
                       const int32_t* ks, int nks) {
  Packer* p = (Packer*)h;
  Cdf& c = p->fams[fam][rec];
  uint32_t psum = 0;
  for (int i = 0; i < nks; i++) {
    int k = ks[i];
    if (k >= c.n) continue;
    uint32_t prev = (k == 0) ? PROB_TOP : c.v[k - 1];
    psum += prev - c.v[k];
  }
  uint16_t derived[3] = {(uint16_t)psum, 0, 0};
  p->ec.symbol_raw(bit, derived, 2);
}

long packer_done(void* h, uint8_t* out, long cap) {
  return (long)((Packer*)h)->ec.done(out, (size_t)cap);
}

}  // extern C
