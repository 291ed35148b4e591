// Native runtime components: BB-frame de-encapsulation and IQ ring buffer.
//
// The reference implements its whole runtime in C++ (bb_de_header.cpp for
// the TS output path, rx_base.cpp + buffers.hh for ingest buffering); this
// library provides the TPU framework's equivalents for the host-side hot
// paths that stay off the accelerator:
//
//  * BbParser — descrambles BB frames, validates the header CRC-8, detects
//    NM/HEM, reassembles 188-byte TS packets across frame boundaries with
//    SYNCD resynchronization and NM per-packet CRC chains (TEI flagging),
//    mirroring /root/reference/src/DVB_T2/bb_de_header.cpp:97-440.
//  * IqRing — single-producer single-consumer lock-free byte ring for the
//    ingest thread (socket/file reader) feeding the compute thread,
//    replacing the reference's mutex-guarded A/B double buffer
//    (/root/reference/src/rx_base.h:44-51).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 dependency).

#include <atomic>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kTsLen = 188;
constexpr int kHeaderBits = 80;
constexpr uint8_t kCrc8Poly = 0xD5;           // byte-table MSB-first
constexpr uint8_t kCrc8PolyReflected = 0xAB;  // bit-serial LSB-first
constexpr uint8_t kTeiFlag = 0x80;

struct Crc8Table {
  uint8_t t[256];
  Crc8Table() {
    for (int i = 0; i < 256; ++i) {
      uint8_t crc = 0;
      for (int j = 7; j >= 0; --j) {
        int b = ((i >> j) & 1) ^ ((crc >> 7) & 1);
        crc = static_cast<uint8_t>(crc << 1);
        if (b) crc ^= kCrc8Poly;
      }
      t[i] = crc;
    }
  }
};
const Crc8Table kCrcTable;

uint8_t crc8_bytes(const uint8_t* data, int n) {
  uint8_t crc = 0;
  for (int i = 0; i < n; ++i) crc = kCrcTable.t[data[i] ^ crc];
  return crc;
}

uint8_t crc8_bits(const uint8_t* bits, int n) {
  uint8_t crc = 0;
  for (int i = 0; i < n; ++i) {
    int b = (bits[i] & 1) ^ (crc & 1);
    crc >>= 1;
    if (b) crc ^= kCrc8PolyReflected;
  }
  return crc;
}

}  // namespace

// ---------------------------------------------------------------------------
// BB-frame parser
// ---------------------------------------------------------------------------

struct BbParser {
  std::vector<uint8_t> partial;
  std::vector<uint8_t> scrambler;   // cached PRBS bits
  int crc = -1;                     // -1 = NM CRC chain not established
  bool synced = false;
  int64_t header_errors = 0;
  int64_t crc_errors = 0;
  int hem = -1;

  const uint8_t* prbs(int length) {
    if (static_cast<int>(scrambler.size()) < length) {
      scrambler.resize(length);
      uint32_t sr = 0x4A80;
      for (int i = 0; i < length; ++i) {
        uint32_t b = (sr ^ (sr >> 1)) & 1;
        scrambler[i] = static_cast<uint8_t>(b);
        sr >>= 1;
        if (b) sr |= 0x4000;
      }
    }
    return scrambler.data();
  }
};

extern "C" {

BbParser* bb_parser_new() { return new BbParser(); }
void bb_parser_free(BbParser* p) { delete p; }
int64_t bb_parser_header_errors(const BbParser* p) { return p->header_errors; }
int64_t bb_parser_crc_errors(const BbParser* p) { return p->crc_errors; }
int bb_parser_hem(const BbParser* p) { return p->hem; }

// frame_bits: k_bch scrambled bits (one byte per bit, values 0/1).
// out: caller buffer for TS bytes (capacity >= k_bch/8 + 188).
// Returns the number of TS bytes written (multiple of 188), or -1 on a
// header CRC failure.
int bb_parser_parse(BbParser* p, const uint8_t* frame_bits, int k_bch,
                    uint8_t* out) {
  std::vector<uint8_t> bits(k_bch);
  const uint8_t* sc = p->prbs(k_bch);
  for (int i = 0; i < k_bch; ++i) bits[i] = (frame_bits[i] ^ sc[i]) & 1;

  uint8_t check = crc8_bits(bits.data(), kHeaderBits);
  bool hem;
  if (check == 0) {
    hem = false;
  } else if (check == kCrc8PolyReflected) {
    hem = true;
  } else {
    p->header_errors++;
    p->synced = false;
    return -1;
  }
  p->hem = hem ? 1 : 0;

  auto get16 = [&](int pos) {
    int v = 0;
    for (int i = 0; i < 16; ++i) v = (v << 1) | bits[pos + i];
    return v;
  };
  int dfl = get16(32);
  int syncd = get16(56);
  if (dfl <= 0 || kHeaderBits + dfl > k_bch) return 0;

  // pack the data field into bytes
  int dfl_bytes = dfl / 8;
  std::vector<uint8_t> data(dfl_bytes);
  for (int i = 0; i < dfl_bytes; ++i) {
    uint8_t b = 0;
    const uint8_t* src = bits.data() + kHeaderBits + 8 * i;
    for (int j = 0; j < 8; ++j) b = static_cast<uint8_t>((b << 1) | src[j]);
    data[i] = b;
  }

  int unit = hem ? kTsLen - 1 : kTsLen;
  const uint8_t* d = data.data();
  int n = dfl_bytes;
  if (syncd == 0xFFFF) {
    // continuation-only frame: everything extends the in-flight packet
    if (!p->synced) return 0;
  } else if (!p->synced) {
    int skip = syncd / 8;
    if (skip > n) return 0;
    d += skip;
    n -= skip;
    p->partial.clear();
    p->synced = true;
    p->crc = -1;                   // fresh sync: no CRC chain yet
  } else {
    int need = (unit - static_cast<int>(p->partial.size())) % unit;
    int skip = syncd / 8;
    bool aligned = (skip == need) ||
                   (p->partial.empty() && skip == 0);
    if (!aligned) {
      p->crc_errors++;
      if (skip > n) return 0;
      d += skip;
      n -= skip;
      p->partial.clear();
      p->crc = -1;                 // CRC chain broken: re-arm
    }
  }

  std::vector<uint8_t> stream;
  stream.reserve(p->partial.size() + n);
  stream.insert(stream.end(), p->partial.begin(), p->partial.end());
  stream.insert(stream.end(), d, d + n);
  int n_units = static_cast<int>(stream.size()) / unit;
  p->partial.assign(stream.begin() + n_units * unit, stream.end());

  int written = 0;
  for (int u = 0; u < n_units; ++u) {
    const uint8_t* up = stream.data() + u * unit;
    out[written] = 0x47;
    if (hem) {
      std::memcpy(out + written + 1, up, unit);
    } else {
      std::memcpy(out + written + 1, up + 1, unit - 1);
      if (p->crc >= 0 && p->crc != up[0]) {
        p->crc_errors++;
        out[written + 1] |= kTeiFlag;
      }
      p->crc = crc8_bytes(up + 1, unit - 1);
    }
    written += kTsLen;
  }
  return written;
}

uint8_t dvbt2_crc8_bytes(const uint8_t* data, int n) {
  return crc8_bytes(data, n);
}
uint8_t dvbt2_crc8_bits(const uint8_t* bits, int n) {
  return crc8_bits(bits, n);
}

// ---------------------------------------------------------------------------
// SPSC lock-free ring buffer (ingest thread -> compute thread)
// ---------------------------------------------------------------------------

struct IqRing {
  std::vector<uint8_t> buf;
  size_t cap;
  std::atomic<uint64_t> head{0};   // written by producer
  std::atomic<uint64_t> tail{0};   // written by consumer
  std::atomic<uint64_t> dropped{0};
  explicit IqRing(size_t capacity) : buf(capacity), cap(capacity) {}
};

IqRing* iq_ring_new(uint64_t capacity) { return new IqRing(capacity); }
void iq_ring_free(IqRing* r) { delete r; }
uint64_t iq_ring_dropped(const IqRing* r) {
  return r->dropped.load(std::memory_order_relaxed);
}
uint64_t iq_ring_fill(const IqRing* r) {
  return r->head.load(std::memory_order_acquire) -
         r->tail.load(std::memory_order_acquire);
}

// Producer: copies n bytes in; drops the block if the ring is full
// (matching the reference's overrun policy, rx_base.cpp:185-198).
// Returns 1 on success, 0 if dropped.
int iq_ring_push(IqRing* r, const uint8_t* src, uint64_t n) {
  uint64_t head = r->head.load(std::memory_order_relaxed);
  uint64_t tail = r->tail.load(std::memory_order_acquire);
  if (head - tail + n > r->cap) {
    r->dropped.fetch_add(n, std::memory_order_relaxed);
    return 0;
  }
  uint64_t pos = head % r->cap;
  uint64_t first = std::min(n, r->cap - pos);
  std::memcpy(r->buf.data() + pos, src, first);
  std::memcpy(r->buf.data(), src + first, n - first);
  r->head.store(head + n, std::memory_order_release);
  return 1;
}

// Consumer: copies up to n bytes out; returns the number copied.
uint64_t iq_ring_pop(IqRing* r, uint8_t* dst, uint64_t n) {
  uint64_t head = r->head.load(std::memory_order_acquire);
  uint64_t tail = r->tail.load(std::memory_order_relaxed);
  uint64_t avail = head - tail;
  if (n > avail) n = avail;
  uint64_t pos = tail % r->cap;
  uint64_t first = std::min(n, r->cap - pos);
  std::memcpy(dst, r->buf.data() + pos, first);
  std::memcpy(dst + first, r->buf.data(), n - first);
  r->tail.store(tail + n, std::memory_order_release);
  return n;
}

}  // extern "C"
