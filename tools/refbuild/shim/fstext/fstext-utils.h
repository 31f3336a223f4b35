// Shim fstext-utils.h: just the functions the decoder/lattice chain
// links against (the real header drags in determinize-star.h and
// deterministic-fst.h, which need the full OpenFst API).
//
// PROVENANCE NOTE: this is TEST-HARNESS code whose sole purpose is to
// compile the REFERENCE'S OWN binaries for cross-validation against
// eesen_tpu (tests/test_reference_parity.py).  GetLinearSymbolSequence
// and ReadFstKaldi are deliberately faithful transcriptions of the
// reference's versions (fstext-utils-inl.h:125-165, :1267-1291) — they
// must behave identically for the reference binaries to behave as
// upstream's would.  Nothing here is part of the eesen_tpu framework,
// whose own FST stack (eesen_tpu/decoder/fst.py, csrc/fstlib.cpp) is an
// independent design.
#ifndef MINIFST_FSTEXT_UTILS_H_
#define MINIFST_FSTEXT_UTILS_H_

#include "fst/fstlib.h"
#include "base/kaldi-common.h"
#include "util/kaldi-io.h"

namespace fst {

// fstext-utils.h:133 GetLinearSymbolSequence — symbol sequence of a
// linear FST (the decoder's best-path output), reimplemented for the
// shim build.
template <class Arc, class I>
bool GetLinearSymbolSequence(const Fst<Arc> &fst,
                             vector<I> *isymbols_out,
                             vector<I> *osymbols_out,
                             typename Arc::Weight *tot_weight_out) {
  typedef typename Arc::Weight Weight;
  typedef typename Arc::StateId StateId;
  Weight tot_weight = Weight::One();
  vector<I> ilabel_seq, olabel_seq;
  StateId cur_state = fst.Start();
  if (cur_state == kNoStateId) {  // empty sequence
    if (isymbols_out != nullptr) isymbols_out->clear();
    if (osymbols_out != nullptr) osymbols_out->clear();
    if (tot_weight_out != nullptr) *tot_weight_out = Weight::Zero();
    return true;
  }
  while (true) {
    Weight w = fst.Final(cur_state);
    if (w != Weight::Zero()) {
      if (fst.NumArcs(cur_state) != 0) return false;
      tot_weight = Times(w, tot_weight);
      break;
    }
    if (fst.NumArcs(cur_state) != 1) return false;
    ArcIterator<Fst<Arc>> iter(fst, cur_state);
    const Arc &arc = iter.Value();
    if (arc.ilabel != 0) ilabel_seq.push_back(arc.ilabel);
    if (arc.olabel != 0) olabel_seq.push_back(arc.olabel);
    tot_weight = Times(arc.weight, tot_weight);
    cur_state = arc.nextstate;
  }
  if (isymbols_out != nullptr) *isymbols_out = ilabel_seq;
  if (osymbols_out != nullptr) *osymbols_out = olabel_seq;
  if (tot_weight_out != nullptr) *tot_weight_out = tot_weight;
  return true;
}

// fstext-utils-inl.h:1267 ReadFstKaldi
inline VectorFst<StdArc> *ReadFstKaldi(std::string rxfilename) {
  if (rxfilename == "") rxfilename = "-";
  eesen::Input ki(rxfilename);
  fst::FstHeader hdr;
  if (!hdr.Read(ki.Stream(), rxfilename))
    KALDI_ERR << "Reading FST: error reading FST header from "
              << eesen::PrintableRxfilename(rxfilename);
  FstReadOptions ropts("<unspecified>", &hdr);
  VectorFst<StdArc> *fst = VectorFst<StdArc>::Read(ki.Stream(), ropts);
  if (!fst)
    KALDI_ERR << "Could not read fst from "
              << eesen::PrintableRxfilename(rxfilename);
  return fst;
}

inline void WriteFstKaldi(const VectorFst<StdArc> &fst,
                          std::string wxfilename) {
  if (wxfilename == "") wxfilename = "-";
  bool write_binary = true, write_header = false;
  eesen::Output ko(wxfilename, write_binary, write_header);
  FstWriteOptions wopts(wxfilename);
  fst.Write(ko.Stream(), wopts);
}

}  // namespace fst

#endif  // MINIFST_FSTEXT_UTILS_H_
