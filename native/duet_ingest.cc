// duet_ingest — native BAM/BGZF ingest for duet_tpu.
//
// The framework's answer to the reference pipeline's samtools/text
// round-trips (reference src/duet/sv_phasing_fn.py:25: `samtools view`
// ASCII dump re-parsed per chromosome): decode the BAM ONCE, in native
// code, straight into the packed column arrays duet_tpu.io.readstore
// defines — no text, no per-stage re-reads.
//
// Layout produced (C API below, consumed via ctypes from
// duet_tpu/io/native_ingest.py):
//   per read  : ref_id i32, pos i64, end i64, mapq u8, flag u16
//   ragged    : name bytes, cigar (op i8 / len i32), seq codes u8, qual u8
//               each with (n+1) int64 offset arrays
// Only primary mapped alignments are kept (flag & 0x904 == 0), matching
// the Python reader's filter.
//
// BGZF blocks are independent gzip members; decompression runs on a
// std::thread pool over blocks, then records are parsed from the
// concatenated stream in one pass.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

struct BgzfBlock {
  size_t in_off;    // compressed offset of the gzip member
  size_t in_size;   // total member size (BSIZE+1)
  size_t out_off;   // offset in the inflated stream
  size_t out_size;  // ISIZE
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(sz));
  size_t got = sz ? std::fread(out.data(), 1, out.size(), f) : 0;
  std::fclose(f);
  return got == out.size();
}

// Scan BGZF member headers: each has a gzip header with FEXTRA and a
// BC subfield carrying BSIZE (total block size - 1); ISIZE is the last
// 4 bytes of the member.
bool scan_blocks(const std::vector<uint8_t>& buf, std::vector<BgzfBlock>& blocks) {
  size_t off = 0, out_off = 0;
  const size_t n = buf.size();
  while (off + 18 <= n) {
    if (buf[off] != 0x1f || buf[off + 1] != 0x8b) return false;
    uint16_t xlen = static_cast<uint16_t>(buf[off + 10] | (buf[off + 11] << 8));
    size_t extra = off + 12;
    size_t extra_end = extra + xlen;
    if (extra_end > n) return false;
    uint32_t bsize = 0;
    bool found = false;
    while (extra + 4 <= extra_end) {
      uint8_t si1 = buf[extra], si2 = buf[extra + 1];
      uint16_t slen = static_cast<uint16_t>(buf[extra + 2] | (buf[extra + 3] << 8));
      if (si1 == 'B' && si2 == 'C' && slen == 2 && extra + 6 <= extra_end) {
        bsize = static_cast<uint32_t>(buf[extra + 4] | (buf[extra + 5] << 8)) + 1u;
        found = true;
      }
      extra += 4 + slen;
    }
    if (!found || off + bsize > n || bsize < 28) return false;
    uint32_t isize;
    std::memcpy(&isize, buf.data() + off + bsize - 4, 4);
    blocks.push_back({off, bsize, out_off, isize});
    out_off += isize;
    off += bsize;
    if (isize == 0 && off >= n) break;  // EOF marker block
  }
  return true;
}

bool inflate_block(const uint8_t* src, size_t src_size, uint8_t* dst,
                   size_t dst_size) {
  if (dst_size == 0) return true;
  z_stream s;
  std::memset(&s, 0, sizeof(s));
  if (inflateInit2(&s, 15 + 16) != Z_OK) return false;  // gzip wrapper
  s.next_in = const_cast<uint8_t*>(src);
  s.avail_in = static_cast<uInt>(src_size);
  s.next_out = dst;
  s.avail_out = static_cast<uInt>(dst_size);
  int rc = inflate(&s, Z_FINISH);
  inflateEnd(&s);
  return rc == Z_STREAM_END && s.total_out == dst_size;
}

// skip unmapped + secondary; KEEP supplementary segments — they carry the
// split-read evidence the SV caller needs (matches the Python reader)
constexpr uint16_t kSkipFlags = 0x4 | 0x100;

// nibble -> framework base code (A=0 C=1 G=2 T=3 N/other=4)
constexpr uint8_t kNibCode[16] = {4, 0, 1, 4, 2, 4, 4, 4, 3, 4, 4, 4, 4, 4, 4, 4};

struct Store {
  // header
  std::string header_text;
  std::vector<std::string> ref_names;
  std::vector<int32_t> ref_lengths;
  // columns
  std::vector<int32_t> ref_id;
  std::vector<int64_t> pos, end;
  std::vector<uint8_t> mapq;
  std::vector<uint16_t> flag;
  std::vector<int64_t> name_off{0}, cigar_off{0}, seq_off{0};
  std::vector<uint8_t> name_bytes;
  std::vector<int8_t> cigar_ops;
  std::vector<int32_t> cigar_lens;
  std::vector<uint8_t> seq_codes, quals;
  std::string error;
};

// ref-consuming CIGAR ops: M D N = X  (0,2,3,7,8)
inline bool consumes_ref(uint32_t op) {
  return op == 0 || op == 2 || op == 3 || op == 7 || op == 8;
}

bool parse_bam(const uint8_t* p, size_t n, int min_mapq, Store* st) {
  if (n < 12 || std::memcmp(p, "BAM\x01", 4) != 0) {
    st->error = "not a BAM stream";
    return false;
  }
  // payload is roughly half sequence nibbles + half quals; one upfront
  // reservation avoids growth reallocation churn on multi-GB inputs
  st->seq_codes.reserve(n / 2);
  st->quals.reserve(n / 2);
  st->name_bytes.reserve(n / 64);
  st->cigar_ops.reserve(n / 256);
  st->cigar_lens.reserve(n / 256);
  size_t off = 4;
  int32_t l_text;
  std::memcpy(&l_text, p + off, 4); off += 4;
  st->header_text.assign(reinterpret_cast<const char*>(p + off), l_text);
  off += static_cast<size_t>(l_text);
  int32_t n_ref;
  std::memcpy(&n_ref, p + off, 4); off += 4;
  for (int32_t i = 0; i < n_ref; ++i) {
    int32_t l_name, l_ref;
    std::memcpy(&l_name, p + off, 4); off += 4;
    st->ref_names.emplace_back(reinterpret_cast<const char*>(p + off), l_name - 1);
    off += static_cast<size_t>(l_name);
    std::memcpy(&l_ref, p + off, 4); off += 4;
    st->ref_lengths.push_back(l_ref);
  }
  while (off + 4 <= n) {
    int32_t block_size;
    std::memcpy(&block_size, p + off, 4); off += 4;
    if (block_size < 32 || off + static_cast<size_t>(block_size) > n) {
      if (block_size == 0) break;
      st->error = "truncated BAM record";
      return false;
    }
    const uint8_t* r = p + off;
    off += static_cast<size_t>(block_size);

    int32_t ref_id, pos;
    std::memcpy(&ref_id, r, 4);
    std::memcpy(&pos, r + 4, 4);
    uint8_t l_read_name = r[8];
    uint8_t mapq = r[9];
    uint16_t n_cigar, flag;
    std::memcpy(&n_cigar, r + 12, 2);
    std::memcpy(&flag, r + 14, 2);
    int32_t l_seq;
    std::memcpy(&l_seq, r + 16, 4);

    if ((flag & kSkipFlags) || ref_id < 0 || mapq < min_mapq) continue;

    const uint8_t* name_p = r + 32;
    const uint8_t* cig_p = name_p + l_read_name;
    const uint8_t* seq_p = cig_p + 4ull * n_cigar;
    const uint8_t* qual_p = seq_p + (l_seq + 1) / 2;

    st->ref_id.push_back(ref_id);
    st->pos.push_back(pos);
    st->mapq.push_back(mapq);
    st->flag.push_back(flag);

    st->name_bytes.insert(st->name_bytes.end(), name_p, name_p + l_read_name - 1);
    st->name_off.push_back(static_cast<int64_t>(st->name_bytes.size()));

    int64_t ref_span = 0;
    for (uint16_t k = 0; k < n_cigar; ++k) {
      uint32_t v;
      std::memcpy(&v, cig_p + 4ull * k, 4);
      uint32_t op = v & 0xF, len = v >> 4;
      st->cigar_ops.push_back(static_cast<int8_t>(op));
      st->cigar_lens.push_back(static_cast<int32_t>(len));
      if (consumes_ref(op)) ref_span += len;
    }
    st->cigar_off.push_back(static_cast<int64_t>(st->cigar_ops.size()));
    st->end.push_back(pos + (ref_span ? ref_span : 1));

    size_t base = st->seq_codes.size();
    st->seq_codes.resize(base + static_cast<size_t>(l_seq));
    uint8_t* out = st->seq_codes.data() + base;
    int32_t half = l_seq / 2;
    for (int32_t k = 0; k < half; ++k) {
      uint8_t b = seq_p[k];
      out[2 * k] = kNibCode[b >> 4];
      out[2 * k + 1] = kNibCode[b & 0xF];
    }
    if (l_seq & 1) out[l_seq - 1] = kNibCode[seq_p[half] >> 4];
    st->quals.insert(st->quals.end(), qual_p, qual_p + l_seq);
    st->seq_off.push_back(static_cast<int64_t>(st->seq_codes.size()));
  }
  return true;
}

}  // namespace

extern "C" {

// Opaque handle API ----------------------------------------------------------

void* duet_bam_load(const char* path, int min_mapq, int n_threads) {
  std::vector<uint8_t> comp;
  auto* st = new Store();
  if (!read_file(path, comp)) {
    st->error = "cannot read file";
    return st;
  }
  std::vector<BgzfBlock> blocks;
  if (!scan_blocks(comp, blocks)) {
    st->error = "invalid BGZF stream";
    return st;
  }
  size_t total = blocks.empty() ? 0 : blocks.back().out_off + blocks.back().out_size;
  std::vector<uint8_t> raw(total);
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  std::vector<int> ok(n_threads, 1);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t]() {
      for (size_t i = t; i < blocks.size(); i += n_threads) {
        const auto& b = blocks[i];
        if (!inflate_block(comp.data() + b.in_off, b.in_size,
                           raw.data() + b.out_off, b.out_size)) {
          ok[t] = 0;
          return;
        }
      }
    });
  }
  for (auto& th : pool) th.join();
  for (int t = 0; t < n_threads; ++t) {
    if (!ok[t]) {
      st->error = "BGZF inflate failed";
      return st;
    }
  }
  parse_bam(raw.data(), raw.size(), min_mapq, st);
  return st;
}

const char* duet_bam_error(void* h) {
  auto* st = static_cast<Store*>(h);
  return st->error.empty() ? nullptr : st->error.c_str();
}

int64_t duet_bam_n_reads(void* h) {
  return static_cast<int64_t>(static_cast<Store*>(h)->ref_id.size());
}

int32_t duet_bam_n_refs(void* h) {
  return static_cast<int32_t>(static_cast<Store*>(h)->ref_names.size());
}

const char* duet_bam_ref_name(void* h, int32_t i) {
  return static_cast<Store*>(h)->ref_names[i].c_str();
}

int32_t duet_bam_ref_length(void* h, int32_t i) {
  return static_cast<Store*>(h)->ref_lengths[i];
}

// sizes of the ragged payload arrays: [name_bytes, cigar_entries, seq_bytes]
void duet_bam_ragged_sizes(void* h, int64_t* out3) {
  auto* st = static_cast<Store*>(h);
  out3[0] = static_cast<int64_t>(st->name_bytes.size());
  out3[1] = static_cast<int64_t>(st->cigar_ops.size());
  out3[2] = static_cast<int64_t>(st->seq_codes.size());
}

// copy all column data into caller-allocated buffers
void duet_bam_fill(void* h,
                   int32_t* ref_id, int64_t* pos, int64_t* end,
                   uint8_t* mapq, uint16_t* flag,
                   int64_t* name_off, uint8_t* name_bytes,
                   int64_t* cigar_off, int8_t* cigar_ops, int32_t* cigar_lens,
                   int64_t* seq_off, uint8_t* seq_codes, uint8_t* quals) {
  auto* st = static_cast<Store*>(h);
  auto cp = [](auto& vec, auto* dst) {
    if (!vec.empty()) std::memcpy(dst, vec.data(), vec.size() * sizeof(vec[0]));
  };
  cp(st->ref_id, ref_id);
  cp(st->pos, pos);
  cp(st->end, end);
  cp(st->mapq, mapq);
  cp(st->flag, flag);
  cp(st->name_off, name_off);
  cp(st->name_bytes, name_bytes);
  cp(st->cigar_off, cigar_off);
  cp(st->cigar_ops, cigar_ops);
  cp(st->cigar_lens, cigar_lens);
  cp(st->seq_off, seq_off);
  cp(st->seq_codes, seq_codes);
  cp(st->quals, quals);
}

void duet_bam_free(void* h) { delete static_cast<Store*>(h); }

}  // extern "C"
