// Shim fstext-lib.h: the curated subset the decoder/lattice chain needs.
// The real header includes every fstext extension (context-fst,
// table-matcher, determinize-star, ...), all of which require the full
// OpenFst API; the decoder tools only need lattice weights/conversions
// plus the utility functions in the shim fstext-utils.h.
#ifndef MINIFST_FSTEXT_LIB_H_
#define MINIFST_FSTEXT_LIB_H_

#include "fst/fstlib.h"
// reference headers (found on the include path after this shim dir)
#include "fstext/lattice-weight.h"
#include "fstext/lattice-utils.h"
// shim (this directory)
#include "fstext/fstext-utils.h"

namespace fst {

// minimal DeterministicOnDemandFst interface
// (fstext/deterministic-fst.h:49-88 in the reference) — enough for
// lat/lattice-functions.h signatures + ComposeCompactLatticeDeterministic
template <class Arc>
class DeterministicOnDemandFst {
 public:
  typedef typename Arc::StateId StateId;
  typedef typename Arc::Weight Weight;
  typedef typename Arc::Label Label;
  virtual ~DeterministicOnDemandFst() {}
  virtual StateId Start() = 0;
  virtual Weight Final(StateId s) = 0;
  virtual bool GetArc(StateId s, Label ilabel, Arc *oarc) = 0;
};

}  // namespace fst

#endif  // MINIFST_FSTEXT_LIB_H_
