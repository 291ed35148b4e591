// C-ABI oracle over the REFERENCE implementation, compiled AT TEST TIME
// against /root/reference sources (GPL code stays in place — nothing is
// copied into this repository; the .so lands in a temp build dir).
//
// Purpose (VERDICT round-2 "what's missing" #1 / "next" #4): every
// correctness claim of this repo was a closed loop against its own TX
// fixture.  This shim exposes the reference's Qt-free engines as a test
// oracle so cross-implementation tests can catch a mirrored misreading
// of EN 302 755:
//   * LDPC layered offset-min-sum decoder (LDPC/layered_decoder.hh,
//     generic.hh, tables via tables_handler.cc) — scalar int8
//     instantiation, the same algebra the AVX2 build vectorizes;
//   * frequency-(de)interleaver address generation
//     (address_freq_deinterleaver.cpp:136-209);
//   * pilot carrier maps + reference amplitudes
//     (pilot_generator.cpp:2051-2124).
// Qt types are satisfied by empty stubs in qt_stubs/ (the engines only
// touch QMetaType registration).
#include <cstdint>
#include <cstring>

#include "dvbt2_definition.h"
#include "address_freq_deinterleaver.h"
#include "pilot_generator.h"

#include "LDPC/ldpc.hh"
#include "LDPC/generic.hh"
#include "LDPC/layered_decoder.hh"

// from tables_handler.cc
LDPCInterface *create_ldpc(char *standard, char prefix, int number);

namespace {

void fill_params(dvbt2_parameters &p, int fft_mode, int pilot_pattern,
                 int carrier_mode, int papr_mode, int guard,
                 int n_data_total, int l_fc, int preamble = T2_SISO,
                 int miso_group = MISO_TX1) {
  std::memset(&p, 0, sizeof(p));
  p.preamble = preamble;
  p.miso_group = miso_group;
  p.fft_mode = fft_mode;
  p.pilot_pattern = pilot_pattern;
  p.papr_mode = papr_mode;
  p.guard_interval_mode = guard;   // gates FC-symbol presence (clause 8.3.5)
  dvbt2_p2_parameters_init(p);          // n_p2/c_p2 (+ext bwt defaults)
  p.carrier_mode = carrier_mode;
  dvbt2_bwt_ext_parameters_init(p);     // fft_size/k_total/k_ext/l_nulls
  dvbt2_data_parameters_init(p);        // c_data/n_fc/c_fc
  p.n_data = n_data_total - l_fc;       // data symbols excluding FC
  p.l_fc = l_fc;
  p.len_frame = p.n_p2 + n_data_total;
}

}  // namespace

extern "C" {

// k_total, c_p2, c_data, n_fc, c_fc, n_p2, l_nulls, fft_size
int oracle_geometry(int fft_mode, int pilot_pattern, int carrier_mode,
                    int papr_mode, int guard, int *out) {
  dvbt2_parameters p;
  fill_params(p, fft_mode, pilot_pattern, carrier_mode, papr_mode, guard,
              1, 0);
  out[0] = p.k_total; out[1] = p.c_p2; out[2] = p.c_data;
  out[3] = p.n_fc; out[4] = p.c_fc; out[5] = p.n_p2;
  out[6] = p.l_nulls; out[7] = p.fft_size;
  return 0;
}

// Deinterleaver LUTs (RX direction): h[addr] = payload index.
// Buffers sized c_p2 (p2), c_data (data), n_fc (fc).
int oracle_freq_addresses(int fft_mode, int pilot_pattern, int carrier_mode,
                          int papr_mode, int guard, int *h_even_p2,
                          int *h_odd_p2, int *h_even_data, int *h_odd_data,
                          int *h_even_fc, int *h_odd_fc) {
  dvbt2_parameters p;
  fill_params(p, fft_mode, pilot_pattern, carrier_mode, papr_mode, guard,
              1, 0);
  auto *a = new address_freq_deinterleaver();
  a->init(p);
  a->p2_address_freq_deinterleaver(p);
  a->data_address_freq_deinterleaver(p);
  std::memcpy(h_even_p2, a->h_even_p2, sizeof(int) * p.c_p2);
  std::memcpy(h_odd_p2, a->h_odd_p2, sizeof(int) * p.c_p2);
  std::memcpy(h_even_data, a->h_even_data, sizeof(int) * p.c_data);
  std::memcpy(h_odd_data, a->h_odd_data, sizeof(int) * p.c_data);
  if (p.n_fc > 0) {
    std::memcpy(h_even_fc, a->h_even_fc, sizeof(int) * p.n_fc);
    std::memcpy(h_odd_fc, a->h_odd_fc, sizeof(int) * p.n_fc);
  }
  delete a;
  return 0;
}

// P2 + data-symbol carrier maps and pilot reference values.
// p2_map [k_total]; p2_ref [n_p2 * k_total];
// data_map [n_data * k_total]; data_ref [n_data * k_total];
// fc_map [k_total]; fc_ref [k_total]  (zeroed when no FC symbol).
int oracle_pilots(int fft_mode, int pilot_pattern, int carrier_mode,
                  int papr_mode, int guard, int n_data_total, int l_fc,
                  int *p2_map, float *p2_ref, int *data_map,
                  float *data_ref, int *fc_map, float *fc_ref) {
  dvbt2_parameters p;
  fill_params(p, fft_mode, pilot_pattern, carrier_mode, papr_mode, guard,
              n_data_total, l_fc);
  auto *g = new pilot_generator();
  g->p2_generator(p);
  g->data_generator(p);
  int kt = p.k_total;
  for (int i = 0; i < kt; ++i) p2_map[i] = g->p2_carrier_map[i];
  for (int s = 0; s < p.n_p2; ++s)
    for (int i = 0; i < kt; ++i)
      p2_ref[s * kt + i] = g->p2_pilot_refer[s][i];
  for (int s = 0; s < p.n_data; ++s)
    for (int i = 0; i < kt; ++i) {
      data_map[s * kt + i] = g->data_carrier_map[s][i];
      data_ref[s * kt + i] = g->data_pilot_refer[s][i];
    }
  for (int i = 0; i < kt; ++i) {
    fc_map[i] = l_fc ? g->fc_carrier_map[i] : 0;
    fc_ref[i] = l_fc ? g->fc_pilot_refer[i] : 0.0f;
  }
  delete g;
  return p.n_p2;
}

// MISO variants (preamble T2_SISO=0 / T2_MISO=1, miso_group TX1=0 / TX2=1):
// same outputs as oracle_geometry / oracle_pilots with the transmit-group
// pilot inversions of EN 302 755 clause 9.2 (pilot_generator.cpp MISO
// branches) applied.
int oracle_geometry2(int fft_mode, int pilot_pattern, int carrier_mode,
                     int papr_mode, int guard, int preamble, int miso_group,
                     int *out) {
  dvbt2_parameters p;
  fill_params(p, fft_mode, pilot_pattern, carrier_mode, papr_mode, guard,
              1, 0, preamble, miso_group);
  out[0] = p.k_total; out[1] = p.c_p2; out[2] = p.c_data;
  out[3] = p.n_fc; out[4] = p.c_fc; out[5] = p.n_p2;
  out[6] = p.l_nulls; out[7] = p.fft_size;
  return 0;
}

int oracle_pilots2(int fft_mode, int pilot_pattern, int carrier_mode,
                   int papr_mode, int guard, int n_data_total, int l_fc,
                   int preamble, int miso_group, int *p2_map, float *p2_ref,
                   int *data_map, float *data_ref, int *fc_map,
                   float *fc_ref) {
  dvbt2_parameters p;
  fill_params(p, fft_mode, pilot_pattern, carrier_mode, papr_mode, guard,
              n_data_total, l_fc, preamble, miso_group);
  auto *g = new pilot_generator();
  g->p2_generator(p);
  g->data_generator(p);
  int kt = p.k_total;
  for (int i = 0; i < kt; ++i) p2_map[i] = g->p2_carrier_map[i];
  for (int s = 0; s < p.n_p2; ++s)
    for (int i = 0; i < kt; ++i)
      p2_ref[s * kt + i] = g->p2_pilot_refer[s][i];
  for (int s = 0; s < p.n_data; ++s)
    for (int i = 0; i < kt; ++i) {
      data_map[s * kt + i] = g->data_carrier_map[s][i];
      data_ref[s * kt + i] = g->data_pilot_refer[s][i];
    }
  for (int i = 0; i < kt; ++i) {
    fc_map[i] = l_fc ? g->fc_carrier_map[i] : 0;
    fc_ref[i] = l_fc ? g->fc_pilot_refer[i] : 0.0f;
  }
  delete g;
  return p.n_p2;
}

// ---- LDPC decoder oracle (scalar int8, OMS beta=2/FACTOR convention of
// ldpc_decoder.h:34-57: code_type int8_t, FACTOR 2, NormalUpdate) -------
typedef NormalUpdate<int8_t> update_type;
typedef OffsetMinSumAlgorithm<int8_t, update_type, 2> algorithm_type;
typedef LDPCDecoder<int8_t, algorithm_type> decoder_type;

struct OracleLdpc {
  decoder_type dec;
  int n, k;
};

void *oracle_ldpc_create(const char *standard, char prefix, int number) {
  char std_buf[8];
  std::strncpy(std_buf, standard, sizeof(std_buf) - 1);
  std_buf[sizeof(std_buf) - 1] = 0;
  LDPCInterface *it = create_ldpc(std_buf, prefix, number);
  if (!it) return nullptr;
  auto *h = new OracleLdpc();
  h->n = it->code_len();
  h->k = it->data_len();
  h->dec.init(std::move(*it));
  delete it;
  return h;
}

int oracle_ldpc_n(void *vh) { return static_cast<OracleLdpc *>(vh)->n; }
int oracle_ldpc_k(void *vh) { return static_cast<OracleLdpc *>(vh)->k; }

// code: [n] int8 LLRs in natural codeword order (positive = bit 0),
// updated in place to the decoded posteriors.  Returns the reference's
// own result code: remaining trials (>= 0) or negative on failure.
int oracle_ldpc_decode(void *vh, int8_t *code, int trials) {
  auto *h = static_cast<OracleLdpc *>(vh);
  return h->dec(code, code + h->k, trials, 1);
}

void oracle_ldpc_free(void *vh) { delete static_cast<OracleLdpc *>(vh); }

}  // extern "C"
