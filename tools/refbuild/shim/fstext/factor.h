// Shim factor.h: from-scratch Factor() with the contract documented in
// the reference header (fstext/factor.h:42-61): identify linear chains
// of states (olabel only on the first arc of a chain), replace each
// chain with one arc whose new input symbol indexes a sequence of
// original ilabels in *symbols; symbols[0] = [] (epsilon) and
// symbols[i] = [i] for every original symbol i, so length-one chains
// keep their original numbering.  Path semantics (ilabel sequences,
// olabels, weights) are preserved exactly — which is the property
// ConvertLattice (lattice-utils-inl.h:28-87) relies on.
#ifndef MINIFST_FSTEXT_FACTOR_H_
#define MINIFST_FSTEXT_FACTOR_H_

#include <fst/fstlib.h>
#include <fst/fst-decl.h>

namespace fst {

template <class Arc, class I>
void Factor(const Fst<Arc> &fst, MutableFst<Arc> *ofst,
            vector<vector<I>> *symbols) {
  typedef typename Arc::StateId StateId;
  typedef typename Arc::Weight Weight;
  typedef typename Arc::Label Label;

  ofst->DeleteStates();
  symbols->clear();
  const ExpandedFst<Arc> *ex = dynamic_cast<const ExpandedFst<Arc> *>(&fst);
  CHECK(ex != nullptr);
  StateId n = ex->NumStates();
  if (n == 0 || fst.Start() == kNoStateId) return;

  // find the max ilabel so length-one sequences keep their numbering
  Label max_label = 0;
  vector<int> indeg(n, 0);
  for (StateId s = 0; s < n; ++s)
    for (ArcIterator<Fst<Arc>> ai(fst, s); !ai.Done(); ai.Next()) {
      indeg[ai.Value().nextstate]++;
      max_label = std::max(max_label, ai.Value().ilabel);
    }
  symbols->resize(max_label + 1);
  for (Label i = 1; i <= max_label; ++i) (*symbols)[i].push_back(i);

  // a state is chain-interior if it has exactly one in-arc, one
  // out-arc, no final weight, and is not the start state
  auto interior = [&](StateId s) {
    return s != fst.Start() && indeg[s] == 1 && fst.NumArcs(s) == 1 &&
           fst.Final(s) == Weight::Zero();
  };

  // keep the numbering of non-interior states (in original order)
  vector<StateId> newid(n, kNoStateId);
  for (StateId s = 0; s < n; ++s)
    if (!interior(s)) newid[s] = ofst->AddState();
  ofst->SetStart(newid[fst.Start()]);

  std::unordered_map<string, Label> seq_ids;
  auto seq_symbol = [&](const vector<I> &seq) -> Label {
    if (seq.empty()) return 0;
    if (seq.size() == 1) return static_cast<Label>(seq[0]);
    string key(reinterpret_cast<const char *>(seq.data()),
               seq.size() * sizeof(I));
    auto it = seq_ids.find(key);
    if (it != seq_ids.end()) return it->second;
    Label id = static_cast<Label>(symbols->size());
    symbols->push_back(seq);
    seq_ids.emplace(key, id);
    return id;
  };

  for (StateId s = 0; s < n; ++s) {
    if (interior(s)) continue;
    ofst->SetFinal(newid[s], fst.Final(s));
    for (ArcIterator<Fst<Arc>> ai(fst, s); !ai.Done(); ai.Next()) {
      Arc first = ai.Value();
      vector<I> seq;
      if (first.ilabel != 0) seq.push_back(first.ilabel);
      Weight w = first.weight;
      StateId t = first.nextstate;
      // extend through interior states whose single arc has no olabel
      while (interior(t)) {
        ArcIterator<Fst<Arc>> bi(fst, t);
        const Arc &a = bi.Value();
        if (a.olabel != 0) break;  // olabel only allowed on first arc
        if (a.ilabel != 0) seq.push_back(a.ilabel);
        w = Times(w, a.weight);
        t = a.nextstate;
      }
      // if we stopped inside a chain (olabel mid-chain), t may still be
      // interior: materialize it
      StateId tt = t;
      if (newid[tt] == kNoStateId) {
        newid[tt] = ofst->AddState();
        ofst->SetFinal(newid[tt], fst.Final(tt));
        // its outgoing arcs will be emitted when we reach it below —
        // but interior states are skipped by the outer loop, so emit
        // its single arc chain here recursively by marking it
        // non-interior via indeg hack: simplest is to process it now
        // as a fresh source (its arcs get the same chain treatment on
        // a later sweep; see the fixup loop below)
      }
      ofst->AddArc(newid[s], Arc(seq_symbol(seq), first.olabel, w,
                                 newid[tt]));
    }
  }

  // fixup sweep: any interior state that got materialized (mid-chain
  // olabel) still needs its outgoing chain emitted
  bool changed = true;
  while (changed) {
    changed = false;
    for (StateId s = 0; s < n; ++s) {
      if (!interior(s) || newid[s] == kNoStateId) continue;
      if (ofst->NumArcs(newid[s]) > 0) continue;
      if (fst.NumArcs(s) == 0) continue;
      for (ArcIterator<Fst<Arc>> ai(fst, s); !ai.Done(); ai.Next()) {
        Arc first = ai.Value();
        vector<I> seq;
        if (first.ilabel != 0) seq.push_back(first.ilabel);
        Weight w = first.weight;
        StateId t = first.nextstate;
        while (interior(t)) {
          ArcIterator<Fst<Arc>> bi(fst, t);
          const Arc &a = bi.Value();
          if (a.olabel != 0) break;
          if (a.ilabel != 0) seq.push_back(a.ilabel);
          w = Times(w, a.weight);
          t = a.nextstate;
        }
        if (newid[t] == kNoStateId) {
          newid[t] = ofst->AddState();
          ofst->SetFinal(newid[t], fst.Final(t));
          changed = true;
        }
        ofst->AddArc(newid[s], Arc(seq_symbol(seq), first.olabel, w,
                                   newid[t]));
      }
    }
  }
}

// two-FST variant (declared by the reference; unused by the decoder
// chain — left unimplemented on purpose so accidental use fails loudly)
template <class Arc>
void Factor(const Fst<Arc> &fst, MutableFst<Arc> *ofst1,
            MutableFst<Arc> *ofst2);

}  // namespace fst

#endif  // MINIFST_FSTEXT_FACTOR_H_
