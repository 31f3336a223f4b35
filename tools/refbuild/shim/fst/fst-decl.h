// Forward declarations for the mini-OpenFst shim (see fst/fstlib.h).
// This build provides a from-scratch subset of the OpenFst 1.3 API so the
// reference's fst-dependent host tools (latgen-faster) can be compiled
// for cross-validation in an environment with no OpenFst source.
#ifndef MINIFST_FST_DECL_H_
#define MINIFST_FST_DECL_H_

namespace fst {

template <class W> class ArcTpl;
template <class A> class Fst;
template <class A> class ExpandedFst;
template <class A> class MutableFst;
template <class A> class VectorFst;
class SymbolTable;

}  // namespace fst

#endif  // MINIFST_FST_DECL_H_
