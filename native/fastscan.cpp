// fastscan — native single-pass FASTQ/FASTA scanners.
//
// TPU-native counterpart of the reference's C++ parsing stack
// (/root/reference/src/io/fastq_loader.hpp get_next_record :389-490,
// fasta_loader.hpp get_next_record :618+): where the reference walks
// per-character iterators lazily, these scanners make ONE fused pass over a
// byte block and emit the framework's columnar ReadBatch arrays directly
// (codes translated through the alphabet LUT, per-base record ids, raw byte
// offsets, quality bytes), so host parsing keeps up with chip ingest on
// weak host cores where multi-pass numpy parsing cannot.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <cstdint>
#include <cstring>

namespace {

inline const uint8_t* find_eol(const uint8_t* p, const uint8_t* end) {
  const void* nl = memchr(p, '\n', static_cast<size_t>(end - p));
  return nl ? static_cast<const uint8_t*>(nl) : end;
}

inline const uint8_t* line_end(const uint8_t* start, const uint8_t* eol) {
  // trim ALL trailing \r bytes (the reference's NotEOL predicate drops
  // every \r, file_utils.hpp:43-53)
  while (eol > start && eol[-1] == '\r') --eol;
  return eol;
}

}  // namespace

extern "C" {

// Error codes (negative returns)
enum {
  FS_ERR_TRUNCATED = -1,   // incomplete trailing record
  FS_ERR_BAD_HEADER = -2,  // record does not start with '@'
  FS_ERR_BAD_PLUS = -3,    // separator line does not start with '+'
  FS_ERR_LEN_MISMATCH = -4,  // quality length != sequence length
  FS_ERR_CAPACITY = -5,    // output capacity exceeded
};

// Parse a FASTQ block that begins at a record boundary.
//
// data[0..n): block bytes.  from_ascii: 256-entry alphabet LUT.
// file_offset: absolute position of data[0] (for global ids).
//
// Outputs (caller-allocated):
//   per record (cap nrec_cap): record_start (absolute), seq_index base
//     handled by caller; per base (cap nbase_cap): codes, quals, seg_id,
//     offset_in_record (raw bytes from record start), global_pos.
//
// Returns the number of records parsed (>= 0) and writes the base count to
// *out_nbases, or a negative FS_ERR_*.
int64_t fastq_parse(const uint8_t* data, int64_t n, const uint8_t* from_ascii,
                    int64_t file_offset, uint64_t* record_start,
                    int64_t nrec_cap, uint8_t* codes, uint8_t* quals,
                    int32_t* seg_id, uint32_t* offset_in_record,
                    uint64_t* global_pos, int64_t nbase_cap,
                    int64_t* out_nbases) {
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  int64_t nrec = 0;
  int64_t nb = 0;
  while (p < end) {
    // skip blank lines between records
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    const uint8_t* rec = p;
    if (*p != '@') return FS_ERR_BAD_HEADER;
    // line 1: header
    const uint8_t* eol = find_eol(p, end);
    if (eol >= end) return FS_ERR_TRUNCATED;
    p = eol + 1;
    // line 2: sequence
    const uint8_t* seq = p;
    eol = find_eol(p, end);
    const uint8_t* seq_end = line_end(seq, eol);
    if (eol >= end) return FS_ERR_TRUNCATED;
    p = eol + 1;
    // line 3: '+'
    if (p >= end || *p != '+') return FS_ERR_BAD_PLUS;
    eol = find_eol(p, end);
    if (eol >= end) return FS_ERR_TRUNCATED;
    p = eol + 1;
    // line 4: quality
    const uint8_t* qual = p;
    eol = find_eol(p, end);
    const uint8_t* qual_end = line_end(qual, eol);
    p = (eol < end) ? eol + 1 : end;

    const int64_t slen = seq_end - seq;
    if (qual_end - qual != slen) return FS_ERR_LEN_MISMATCH;
    if (nrec >= nrec_cap || nb + slen > nbase_cap) return FS_ERR_CAPACITY;

    record_start[nrec] = static_cast<uint64_t>(file_offset + (rec - data));
    const uint32_t seq_off0 = static_cast<uint32_t>(seq - rec);
    const uint64_t gpos0 = static_cast<uint64_t>(file_offset + (seq - data));
    for (int64_t i = 0; i < slen; ++i) {
      codes[nb + i] = from_ascii[seq[i]];
      quals[nb + i] = qual[i];
      seg_id[nb + i] = static_cast<int32_t>(nrec);
      offset_in_record[nb + i] = seq_off0 + static_cast<uint32_t>(i);
      global_pos[nb + i] = gpos0 + static_cast<uint64_t>(i);
    }
    nb += slen;
    ++nrec;
  }
  *out_nbases = nb;
  return nrec;
}

// Parse a FASTA block that begins at a record header line.
//
// Both '>' and ';' start header lines, and a RUN of consecutive header
// lines is ONE record header (the reference's mxx::unique collapse on the
// header flag, fasta_loader.hpp:295-325): a record starts at a header line
// whose previous visible line is not a header.  Blank lines are invisible
// (they neither break a header run nor contribute sequence).
// Same output layout as fastq_parse; quals are zero-filled.
//
// Block-parallel context (the numpy parser's leading_record_start /
// prev_line_is_header contract, io/fasta.py parse_fasta): when a block
// slice begins mid-record, `leading_record_start` is the ABSOLUTE file
// position of the containing record's header-run start (-1 = the block
// begins at a record header) and leading sequence lines belong to that
// record; `prev_line_is_header` says whether the line just before the
// slice is a header line, so a header run spanning the slice start does
// not open a second record.
int64_t fasta_parse_ctx(const uint8_t* data, int64_t n,
                        const uint8_t* from_ascii, int64_t file_offset,
                        int64_t leading_record_start,
                        int32_t prev_line_is_header, uint64_t* record_start,
                        int64_t nrec_cap, uint8_t* codes, uint8_t* quals,
                        int32_t* seg_id, uint32_t* offset_in_record,
                        uint64_t* global_pos, int64_t nbase_cap,
                        int64_t* out_nbases) {
  const uint8_t* p = data;
  const uint8_t* end = data + n;
  int64_t nrec = 0;
  int64_t nb = 0;
  if (leading_record_start >= 0) {
    if (nrec_cap < 1) return FS_ERR_CAPACITY;
    record_start[0] = static_cast<uint64_t>(leading_record_start);
    nrec = 1;
  }
  // was the previous visible line a header line?
  bool prev_hdr = prev_line_is_header != 0;
  while (p < end) {
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    if (*p == '>' || *p == ';') {  // header line
      if (!prev_hdr) {             // first line of a run => record start
        if (nrec >= nrec_cap) return FS_ERR_CAPACITY;
        record_start[nrec] = static_cast<uint64_t>(file_offset + (p - data));
        ++nrec;
      }
      prev_hdr = true;
      p = find_eol(p, end);
      continue;
    }
    prev_hdr = false;
    if (nrec == 0) return FS_ERR_BAD_HEADER;
    // sequence line
    const uint8_t* eol = find_eol(p, end);
    const uint8_t* sl_end = line_end(p, eol);
    const int64_t slen = sl_end - p;
    if (nb + slen > nbase_cap) return FS_ERR_CAPACITY;
    const int32_t seg = static_cast<int32_t>(nrec - 1);
    const uint64_t rec_pos = record_start[nrec - 1];
    const uint64_t gpos0 = static_cast<uint64_t>(file_offset + (p - data));
    for (int64_t i = 0; i < slen; ++i) {
      codes[nb + i] = from_ascii[p[i]];
      quals[nb + i] = 0;
      seg_id[nb + i] = seg;
      offset_in_record[nb + i] = static_cast<uint32_t>(gpos0 - rec_pos + i);
      global_pos[nb + i] = gpos0 + static_cast<uint64_t>(i);
    }
    nb += slen;
    p = eol;
  }
  *out_nbases = nb;
  return nrec;
}

// Back-compatible entry: block begins at a record header.
int64_t fasta_parse(const uint8_t* data, int64_t n, const uint8_t* from_ascii,
                    int64_t file_offset, uint64_t* record_start,
                    int64_t nrec_cap, uint8_t* codes, uint8_t* quals,
                    int32_t* seg_id, uint32_t* offset_in_record,
                    uint64_t* global_pos, int64_t nbase_cap,
                    int64_t* out_nbases) {
  return fasta_parse_ctx(data, n, from_ascii, file_offset, -1, 0,
                         record_start, nrec_cap, codes, quals, seg_id,
                         offset_in_record, global_pos, nbase_cap, out_nbases);
}

// Locate the first FASTQ record start in a mid-file block — the 4-line
// '@..+' / '+..@' disambiguation (fastq_loader.hpp:269-358).
// Returns the offset, or n if not found.
int64_t fastq_find_record_start(const uint8_t* data, int64_t n,
                                int32_t at_parent_start) {
  const uint8_t* end = data + n;
  // collect up to 4 line-start first-chars + offsets
  const uint8_t* starts[4];
  int cnt = 0;
  const uint8_t* p = data;
  if (!at_parent_start) {
    // skip the partial first line
    if (p < end && *p != '\n' && *p != '\r') p = find_eol(p, end);
  }
  while (p < end && cnt < 4) {
    while (p < end && (*p == '\n' || *p == '\r')) ++p;
    if (p >= end) break;
    starts[cnt++] = p;
    p = find_eol(p, end);
  }
  if (cnt >= 3 && *starts[0] == '@' && *starts[2] == '+')
    return starts[0] - data;
  if (cnt >= 4 && *starts[1] == '@' && *starts[3] == '+')
    return starts[1] - data;
  if (cnt >= 3 && *starts[0] == '+' && *starts[2] == '@')
    return starts[2] - data;
  if (cnt >= 4 && *starts[1] == '+' && *starts[3] == '@')
    return starts[3] - data;
  return n;
}

}  // extern "C"
