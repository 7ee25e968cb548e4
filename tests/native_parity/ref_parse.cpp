// Parity harness #2: drives the REFERENCE's own serial FASTQ/FASTA parsers
// (io/fastq_loader.hpp SequentialFASTQParser, io/fasta_loader.hpp
// FASTAParser via io/sequence_iterator.hpp) and its quality sliding window
// (index/quality_score_iterator.hpp) over real files, dumping per-record
// boundaries and per-window scores for tests/test_ref_parity.py to compare
// against this framework's io/ and quality modules.
//
// Original test scaffolding for kmerind_tpu — includes the read-only
// reference headers, copies nothing.
//
// Usage: ref_parse (fastq|fasta) <path>
// Output:
//   R <fmt> <record_pos> <seq_global_offset> <record_size> <seq> <qual|->
//   Q21 <record_pos> <%a window scores...>      (FASTQ, seqs >= 21 chars)

#include <cstdio>
#include <iostream>
#include <fstream>
#include <iterator>
#include <string>
#include <vector>

#include "index/quality_score_iterator.hpp"
#include "index/quality_scores.hpp"
#include "io/fasta_loader.hpp"
#include "io/fastq_loader.hpp"
#include "io/sequence_iterator.hpp"

using RangeT = bliss::partition::range<size_t>;

static std::string slurp(const char *p) {
  std::ifstream f(p, std::ios::binary);
  return std::string((std::istreambuf_iterator<char>(f)),
                     std::istreambuf_iterator<char>());
}

static void run_fastq(const std::string &data) {
  const char *d = data.data();
  RangeT r(0, data.size());
  bliss::io::SequentialFASTQParser<const char *> parser;
  parser.init_parser(d, r, r, r);
  using SeqIter =
      bliss::io::SequencesIterator<const char *,
                                   bliss::io::SequentialFASTQParser>;
  SeqIter it(parser, d, d + data.size(), 0);
  SeqIter end(d + data.size());
  for (; it != end; ++it) {
    auto const &s = *it;
    std::string sq(s.seq_begin, s.seq_end);
    std::string qu(s.qual_begin, s.qual_end);
    std::printf("R fastq %zu %zu %zu %s %s\n", (size_t)s.id.get_pos(),
                s.seq_global_offset(), s.record_size, sq.c_str(), qu.c_str());
    if (qu.size() >= 21) {
      using QIter = bliss::index::QualityScoreGenerationIterator<
          const char *, 21, bliss::index::Illumina18QualityScoreCodec<double>>;
      const char *qb = &*s.qual_begin;
      QIter qit(qb, true);
      size_t nw = qu.size() - 21 + 1;
      std::printf("Q21 %zu", (size_t)s.id.get_pos());
      for (size_t i = 0; i < nw; ++i) {
        std::printf(" %a", (double)*qit);
        if (i + 1 < nw) ++qit;
      }
      std::printf("\n");
    }
  }
}

static void run_fasta(const std::string &data) {
  const char *d = data.data();
  RangeT r(0, data.size());
  bliss::io::FASTAParser<const char *> parser;
  parser.init_parser(d, r, r, r);
  using SeqIter =
      bliss::io::SequencesIterator<const char *, bliss::io::FASTAParser>;
  SeqIter it(parser, d, d + data.size(), 0);
  SeqIter end(d + data.size());
  for (; it != end; ++it) {
    auto const &s = *it;
    // the reference strips EOLs downstream via the NonEOL filter iterator
    // (io/kmer_parser.hpp:79); apply the same here so the dumped sequence
    // is the k-mer-ized character stream
    std::string sq;
    for (auto p = s.seq_begin; p != s.seq_end; ++p)
      if (*p != '\n' && *p != '\r') sq += *p;
    std::printf("R fasta %zu %zu %zu %s -\n", (size_t)s.id.get_pos(),
                s.seq_global_offset(), s.record_size, sq.c_str());
  }
}

// Drive the reference's serial `find_first_record` (the `@..+` 4-line
// boundary heuristic, fastq_loader.hpp:269-358) at arbitrary split offsets
// read from stdin.  Prints "F <pos> <found>" or "F <pos> THROW" (the
// reference throws logic_error when no marker pattern fits the block).
static void run_findfirst(const std::string &data) {
  const char *d = data.data();
  RangeT whole(0, data.size());
  bliss::io::SequentialFASTQParser<const char *> parser;
  std::string line;
  while (std::getline(std::cin, line)) {
    if (line.empty()) continue;
    size_t pos = std::stoull(line);
    RangeT search(pos, data.size());
    try {
      size_t r = parser.find_first_record(d, whole, whole, search);
      std::printf("F %zu %zu\n", pos, r);
    } catch (...) {
      std::printf("F %zu THROW\n", pos);
    }
  }
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s (fastq|fasta|findfirst) <path>\n",
                 argv[0]);
    return 2;
  }
  std::string data = slurp(argv[2]);
  std::string mode(argv[1]);
  if (mode == "fastq")
    run_fastq(data);
  else if (mode == "findfirst")
    run_findfirst(data);
  else
    run_fasta(data);
  return 0;
}
