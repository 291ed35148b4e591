// Interleaver oracle over the REFERENCE bit/cell/time deinterleavers
// (VERDICT round-3 missing #1): compiles the reference's llr_demapper and
// time_deinterleaver IN PLACE from /root/reference behind inert Qt stubs
// (qt_stubs/) so the one remaining family of spec permutations — combined
// bit-deinterleave scatter LUTs (column twist + demux,
// /root/reference/src/DVB_T2/llr_demapper.cpp:44-116) and the cell/TI
// permutation + fused Q-delay walk
// (/root/reference/src/DVB_T2/time_deinterleaver.cpp:155-317) — gets a
// cross-implementation check instead of only the repo's own TX<->RX loop.
//
// The ctor-spawned QThread stage chain is cut two ways: connect()/emit are
// no-ops (qt_stubs/QObject), and ldpc_decoder — the first stage below the
// ones under test — is replaced by the no-op definitions at the bottom of
// this file (its .cpp is not compiled), so constructing a
// time_deinterleaver builds a real llr_demapper (with its address LUTs)
// and stops there.
//
// `private` is re-spelled `public` ONLY in this TU so the oracle can read
// llr_demapper's ctor-built address arrays; GCC lays members out in
// declaration order regardless of access, and the class definitions are
// otherwise identical to the ones the reference TUs compile.
// std/system headers first, so the access-specifier re-spelling below only
// ever sees the reference headers (their include guards make the nested
// re-includes no-ops)
#include <array>
#include <cmath>
#include <complex>
#include <cstdint>
#include <cstring>
#include <deque>
#include <immintrin.h>
#include <iostream>
#include <map>
#include <memory>
#include <sstream>
#include <vector>

#include "aligned_ptr.h"

#define private public
#include "time_deinterleaver.h"
#undef private

namespace {

// Mirrors the per-modulation TI geometry table of
// time_deinterleaver.cpp:63-120 for sizing oracle outputs.
int cells_per_fec(int plp_mod, int fec_type) {
  const int bits = (plp_mod == 0) ? 2 : (plp_mod == 1) ? 4
                   : (plp_mod == 2) ? 6 : 8;
  const int fec_bits = (fec_type == FEC_FRAME_NORMAL) ? FEC_SIZE_NORMAL
                                                      : FEC_SIZE_SHORT;
  return fec_bits / bits;
}

llr_demapper *demapper_singleton() {
  static QWaitCondition wc;
  static QMutex m;
  static llr_demapper *q = new llr_demapper(&wc, &m);
  return q;
}

}  // namespace

extern "C" {

// Combined bit-deinterleave scatter LUT the reference builds once in its
// ctor (llr_demapper.cpp:44-65 via address_generator :96-116) and uses as
// out[address[i]] = demapped-stream bit i (e.g. :318-328 for 16QAM):
// `out` receives fec_size ints mapping stream-bit index -> position in the
// parity-INTERLEAVED codeword u (the parity de-twist happens later, in
// ldpc_decoder.cpp:226-238).  plp_mod: 1=16QAM 2=64QAM 3=256QAM;
// fec_type: 0=short 1=normal; code_rate: dvbt2_code_rate_t.
// Returns fec_size, or -1 for combinations with no reference LUT.
int oracle_bit_deint_lut(int plp_mod, int fec_type, int code_rate,
                         int *out) {
  llr_demapper *q = demapper_singleton();
  const bool normal = fec_type == FEC_FRAME_NORMAL;
  const int *src = nullptr;
  int n = normal ? FEC_SIZE_NORMAL : FEC_SIZE_SHORT;
  switch (plp_mod) {
    case 1:  // selection logic of llr_demapper.cpp:285-293
      if (normal)
        src = (code_rate == C3_5) ? q->address_qam16_fecnormal_3_5.data()
                                  : q->address_qam16_fecnormal.data();
      else
        src = q->address_qam16_fecshort.data();
      break;
    case 2:  // :442-450
      if (normal)
        src = (code_rate == C3_5) ? q->address_qam64_fecnormal_3_5.data()
                                  : q->address_qam64_fecnormal.data();
      else
        src = q->address_qam64_fecshort.data();
      break;
    case 3:  // :660-669
      if (normal)
        src = (code_rate == C3_5)   ? q->address_qam256_fecnormal_3_5.data()
              : (code_rate == C2_3) ? q->address_qam256_fecnormal_2_3.data()
                                    : q->address_qam256_fecnormal.data();
      else
        src = q->address_qam256_fecshort.data();
      break;
    default:
      return -1;  // QPSK has no twist/demux LUT (llr_demapper.cpp:157-221)
  }
  std::memcpy(out, src, sizeof(int) * n);
  return n;
}

// Raw cell-deinterleave permutation (time_deinterleaver.cpp:155-246):
// out[num_blocks * cells] with out[(S[w] + shift_r) % cells + r*cells] =
// running address — the LFSR base sequence + per-FEC-block bit-reversed
// shift of EN 302 755 clause 6.4.
int oracle_cell_deint_permutation(int plp_mod, int fec_type, int num_blocks,
                                  int *out) {
  QWaitCondition wc;
  QMutex m;
  auto *td = new time_deinterleaver(&wc, &m);
  td->address_cell_deinterleaving(num_blocks, cells_per_fec(plp_mod, fec_type),
                                  out);
  delete td;
  return num_blocks * cells_per_fec(plp_mod, fec_type);
}

// Full time-deinterleaver walk (permutation + column-major TI read + fused
// cyclic-Q-delay removal, time_deinterleaver.cpp:268-358): feeds one
// interleaving frame of complex cells (in_re/in_im, the PLP slice in
// transmission order, num_blocks*cells values) through a real
// time_deinterleaver configured from a synthetic L1, and returns the
// deinterleaved cells (natural FEC-block-major order) via out_re/out_im.
// time_il_type is 0 (n_ti = time_il_length TI blocks per frame, the
// configuration the repo's pipeline uses).  Returns cells written or -1.
//
// Two PLPs with identical parameters are configured because the
// reference's l1_dyn_execute computes slice_end from
// cells_per_fec_block[1] (time_deinterleaver.cpp:254 — a latent [i]/[1]
// bug): identical configs make the read well-defined AND equal to the
// intended value.
int oracle_time_deint(int plp_mod, int fec_type, int num_blocks,
                      int num_blocks_max, int time_il_length,
                      const float *in_re, const float *in_im, float *out_re,
                      float *out_im) {
  if (time_il_length < 1 || num_blocks < time_il_length) return -1;
  const int cells = cells_per_fec(plp_mod, fec_type);
  const int total = num_blocks * cells;

  QWaitCondition wc;
  QMutex m;
  auto *td = new time_deinterleaver(&wc, &m);

  dvbt2_parameters dvbt2;
  std::memset(&dvbt2, 0, sizeof(dvbt2));
  l1_presignalling pre;
  pre.l1_post_size = 0;  // p2_start_idx_cell = L1_PRE_CELL
  l1_postsignalling post;
  post.num_plp = 2;
  post.plp.resize(2);
  post.dyn.plp.resize(2);
  for (int i = 0; i < 2; ++i) {
    post.plp[i].id = i;
    post.plp[i].plp_mod = plp_mod;
    post.plp[i].plp_fec_type = fec_type;
    post.plp[i].plp_num_blocks_max = num_blocks_max;
    post.plp[i].time_il_type = 0;
    post.plp[i].time_il_length = time_il_length;
    post.plp[i].frame_interval = 1;
    post.plp[i].first_frame_idx = 0;
    post.dyn.plp[i].id = i;
  }
  post.dyn.plp[0].start = 0;
  post.dyn.plp[0].num_blocks = num_blocks;
  post.dyn.plp[1].start = 16 * total;  // never reached, never matched
  post.dyn.plp[1].num_blocks = 0;

  td->start(dvbt2, pre, post);
  td->l1_dyn_execute(post);  // runs execute() on an empty fifo: no-op

  std::vector<complex> in(L1_PRE_CELL + total);
  for (int j = 0; j < total; ++j)
    in[L1_PRE_CELL + j] = complex(in_re[j], in_im[j]);
  td->fifo.push(in);
  td->execute();

  // one qam->fifo push per TI block; smaller blocks come first
  // (l1_dyn_execute's remainder rule, time_deinterleaver.cpp:255-263)
  const int f_base = num_blocks / time_il_length;
  int written = 0;
  for (int j = 0; j < time_il_length; ++j) {
    int f = f_base;
    if (j >= time_il_length - num_blocks % time_il_length) f += 1;
    const int ti_cells = f * cells;
    std::vector<complex> blk;
    if (!td->qam->fifo.shift(blk)) {
      delete td;
      return -1;
    }
    const complex *data = get_aligned(blk.data(), 64);
    for (int k = 0; k < ti_cells; ++k) {
      out_re[written + k] = data[k].real();
      out_im[written + k] = data[k].imag();
    }
    written += ti_cells;
  }
  delete td;
  return written;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Inert replacements for the stage below the ones under test: llr_demapper's
// ctor does `new ldpc_decoder(...)` (llr_demapper.cpp:68-80); these no-op
// definitions (ldpc_decoder.cpp is NOT compiled into the oracle) terminate
// the construction chain before bch_decoder/bb_de_header.
// ---------------------------------------------------------------------------
ldpc_decoder::ldpc_decoder(QWaitCondition *, QMutex *, QObject *parent)
    : QObject(parent) {}
ldpc_decoder::~ldpc_decoder() {}
void ldpc_decoder::execute(idx_plp_simd_t, l1_postsignalling, int,
                           fec_frame) {}
void ldpc_decoder::stop() {}
void ldpc_decoder::bch_frame_finished() {}
// moc-less signal bodies (emit is a no-op macro, but the calls remain)
void ldpc_decoder::frame_finished() {}
void ldpc_decoder::finished() {}
void ldpc_decoder::stop_decoder() {}

// moc would normally generate these signal bodies:
void time_deinterleaver::ti_block(int, int, l1_postsignalling) {}
void time_deinterleaver::replace_constelation(const int, complex *) {}
void time_deinterleaver::stop_qam() {}
void time_deinterleaver::finished() {}

void llr_demapper::signal_noise_ratio(float) {}
void llr_demapper::soft_multiplexer_de_twist(idx_plp_simd_t,
                                             l1_postsignalling, int,
                                             fec_frame) {}
void llr_demapper::stop_decoder() {}
void llr_demapper::finished() {}
