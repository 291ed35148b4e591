// BB-deheader / TS-packetizer oracle over the REFERENCE bb_de_header
// (/root/reference/src/DVB_T2/bb_de_header.cpp): feed descrambled BB
// frames (bit arrays, as the reference's bch stage emits them) through
// the reference's header parse + TS reassembly — NM per-packet CRC8 with
// TEI flagging, HEM sync-byte re-insertion, SYNCD split handling — and
// capture the TS bytes it would write to its output device.
//
// Closes the TS-encapsulation family against the reference the same way
// shim_l1.cc closes L1: this repo's BB packer and parsers share
// conventions, so only an independent implementation can catch a
// mirrored misreading of EN 302 755 clause 5.1.
//
// The "output device" is a capturing QDataStream stub registered as a
// file sink for the PLP under test (qt_stubs/QDataStream).
// std/system headers first, so the access-specifier re-spelling below
// only ever sees the reference headers
#include <array>
#include <complex>
#include <cstdint>
#include <cstring>
#include <iostream>
#include <map>
#include <memory>
#include <sstream>
#include <vector>

#define private public
#include "bb_de_header.h"
#undef private

extern "C" {

// frames: n_frames x frame_bits DESCRAMBLED BB-frame bits (one byte per
// bit).  Returns TS bytes written into out (up to out_cap), or the total
// produced (caller re-sizes if larger), or -1 on failure.
int oracle_bb_parse(const uint8_t *frames, int n_frames, int frame_bits,
                    int plp_id, uint8_t *out, int out_cap) {
  static QWaitCondition wc;
  static QMutex m;
  auto *bb = new bb_de_header(&wc, &m);
  bb->out_devices[plp_id].out_type = bb_de_header::id_out::out_file;
  bb->out_devices[plp_id].stream_ptr.reset(new QDataStream());
  l1_postsignalling post;
  post.num_plp = 1;

  std::vector<uint8_t> buf(frame_bits);
  for (int f = 0; f < n_frames; ++f) {
    std::memcpy(buf.data(), frames + f * frame_bits, frame_bits);
    bb->execute(plp_id, post, frame_bits, buf.data());
  }
  const std::vector<char> &cap =
      bb->out_devices[plp_id].stream_ptr->captured;
  int n = static_cast<int>(cap.size());
  std::memcpy(out, cap.data(), n < out_cap ? n : out_cap);
  delete bb;
  return n;
}

}  // extern "C"

// moc-less signal bodies (emit is a no-op macro, but the calls remain)
void bb_de_header::ts_stage(QString) {}
void bb_de_header::finished() {}
