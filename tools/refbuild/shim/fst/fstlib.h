// Mini-OpenFst: a from-scratch implementation of the subset of the
// OpenFst 1.3 API that the reference's decoder/lattice host tools
// consume (latgen-faster + lat/ + fstext/lattice-*).  No OpenFst source
// exists in this environment (zero egress), so this shim makes the
// reference's own LatticeFasterDecoder buildable for cross-validation
// against eesen_tpu's TPU decoder (tests/test_reference_parity.py).
//
// Binary VectorFst serialization matches the real OpenFst layout
// (magic 2125659606, "vector", arctype, version 2, flags, properties,
// start/numstates/numarcs int64, then per state: weight, int64 narcs,
// arcs) — the same layout eesen_tpu/decoder/lattice_io.py reads and
// writes, so FSTs/lattices flow between the two stacks byte-compatibly.
//
// This is test harness code, not part of the eesen_tpu framework.
#ifndef MINIFST_FSTLIB_H_
#define MINIFST_FSTLIB_H_

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <iostream>
#include <limits>
#include <map>
#include <queue>
#include <set>
#include <sstream>
#include <string>
#include <unordered_map>
#include <unordered_set>
#include <vector>

// OpenFst-1.3-era base macro
#ifndef DISALLOW_COPY_AND_ASSIGN
#define DISALLOW_COPY_AND_ASSIGN(type) \
  type(const type &);                  \
  void operator=(const type &)
#endif

// glog-style CHECK used by OpenFst-1.3-era code
#ifndef CHECK
#define CHECK(x)                                               \
  do {                                                         \
    if (!(x)) {                                                \
      std::cerr << "CHECK failed: " #x << std::endl;           \
      std::abort();                                            \
    }                                                          \
  } while (0)
#endif

// OpenFst 1.3 command-line flags (global scope, like the real library)
static const std::string FLAGS_fst_weight_separator = ",";
static const std::string FLAGS_fst_field_separator = " \t";

namespace fst {

using std::istream;
using std::ostream;
using std::string;
using std::vector;
// the reference's fstext headers use these unqualified inside
// namespace fst (the real OpenFst exported them the same way)
using std::numeric_limits;
using std::unordered_set;
using std::unordered_map;
using std::stringstream;
using std::istringstream;
using std::ostringstream;
using std::cout;
using std::cerr;
using std::endl;
using std::pair;
using std::make_pair;
using std::queue;
using std::priority_queue;
using std::map;
using std::set;
using std::greater;
using std::less;

const char kStringSeparator = '_';

typedef int64_t int64;
typedef uint64_t uint64;
typedef int32_t int32;
typedef uint32_t uint32;

const int kNoStateId = -1;
const int kNoLabel = -1;
const float kDelta = 1.0F / 1024.0F;

// property bits (values match OpenFst where files round-trip)
const uint64 kExpanded = 0x0000000000000001ULL;
const uint64 kMutable = 0x0000000000000002ULL;
const uint64 kError = 0x0000000000000004ULL;
const uint64 kAcceptor = 0x0000000000010000ULL;
const uint64 kNotAcceptor = 0x0000000000020000ULL;
const uint64 kIDeterministic = 0x0000000000040000ULL;
const uint64 kNonIDeterministic = 0x0000000000080000ULL;
const uint64 kODeterministic = 0x0000000000100000ULL;
const uint64 kNonODeterministic = 0x0000000000200000ULL;
const uint64 kEpsilons = 0x0000000000400000ULL;
const uint64 kNoEpsilons = 0x0000000000800000ULL;
const uint64 kIEpsilons = 0x0000000001000000ULL;
const uint64 kNoIEpsilons = 0x0000000002000000ULL;
const uint64 kILabelSorted = 0x0000000010000000ULL;
const uint64 kNotILabelSorted = 0x0000000020000000ULL;
const uint64 kOLabelSorted = 0x0000000040000000ULL;
const uint64 kNotOLabelSorted = 0x0000000080000000ULL;
const uint64 kWeighted = 0x0000000100000000ULL;
const uint64 kUnweighted = 0x0000000200000000ULL;
const uint64 kCyclic = 0x0000000400000000ULL;
const uint64 kAcyclic = 0x0000000800000000ULL;
const uint64 kInitialCyclic = 0x0000001000000000ULL;
const uint64 kInitialAcyclic = 0x0000002000000000ULL;
const uint64 kTopSorted = 0x0000004000000000ULL;
const uint64 kNotTopSorted = 0x0000008000000000ULL;
const uint64 kAccessible = 0x0000010000000000ULL;
const uint64 kNotAccessible = 0x0000020000000000ULL;
const uint64 kCoAccessible = 0x0000040000000000ULL;
const uint64 kNotCoAccessible = 0x0000080000000000ULL;
const uint64 kFstProperties = 0x00000FFFFFFFFFFFULL;

// weight semiring property bits
const uint64 kLeftSemiring = 0x1ULL;
const uint64 kRightSemiring = 0x2ULL;
const uint64 kSemiring = kLeftSemiring | kRightSemiring;
const uint64 kCommutative = 0x4ULL;
const uint64 kIdempotent = 0x8ULL;
const uint64 kPath = 0x10ULL;

enum DivideType { DIVIDE_LEFT, DIVIDE_RIGHT, DIVIDE_ANY };

// ArcMapper interface constants (fst/map.h in real OpenFst)
enum MapFinalAction {
  MAP_NO_SUPERFINAL,
  MAP_ALLOW_SUPERFINAL,
  MAP_REQUIRE_SUPERFINAL
};
enum MapSymbolsAction {
  MAP_CLEAR_SYMBOLS,
  MAP_COPY_SYMBOLS,
  MAP_NOOP_SYMBOLS
};

// ---------------------------------------------------------------------
// binary IO helpers (OpenFst util.h WriteType/ReadType semantics)
// ---------------------------------------------------------------------

template <class T>
inline ostream &WriteType(ostream &strm, const T &t) {
  strm.write(reinterpret_cast<const char *>(&t), sizeof(T));
  return strm;
}

inline ostream &WriteType(ostream &strm, const string &s) {
  int32 n = static_cast<int32>(s.size());
  strm.write(reinterpret_cast<const char *>(&n), sizeof(n));
  strm.write(s.data(), n);
  return strm;
}

template <class T>
inline istream &ReadType(istream &strm, T *t) {
  strm.read(reinterpret_cast<char *>(t), sizeof(T));
  return strm;
}

inline istream &ReadType(istream &strm, string *s) {
  int32 n = 0;
  strm.read(reinterpret_cast<char *>(&n), sizeof(n));
  s->resize(n);
  if (n > 0) strm.read(&(*s)[0], n);
  return strm;
}

// ---------------------------------------------------------------------
// TropicalWeight
// ---------------------------------------------------------------------

template <class T>
class TropicalWeightTpl {
 public:
  typedef TropicalWeightTpl ReverseWeight;

  TropicalWeightTpl() : value_(0) {}
  TropicalWeightTpl(T v) : value_(v) {}  // NOLINT: implicit like OpenFst

  T Value() const { return value_; }
  void SetValue(T v) { value_ = v; }

  static const TropicalWeightTpl Zero() {
    return TropicalWeightTpl(std::numeric_limits<T>::infinity());
  }
  static const TropicalWeightTpl One() { return TropicalWeightTpl(0); }
  static const TropicalWeightTpl NoWeight() {
    return TropicalWeightTpl(std::numeric_limits<T>::quiet_NaN());
  }
  static const string &Type() {
    static const string type =
        sizeof(T) == 4 ? "tropical" : "tropical64";
    return type;
  }
  static uint64 Properties() {
    return kLeftSemiring | kRightSemiring | kCommutative | kIdempotent |
           kPath;
  }
  bool Member() const { return !(value_ != value_); }  // not NaN
  TropicalWeightTpl Quantize(float delta = kDelta) const {
    if (!Member() || value_ == std::numeric_limits<T>::infinity())
      return *this;
    return TropicalWeightTpl(std::floor(value_ / delta + 0.5F) * delta);
  }
  TropicalWeightTpl Reverse() const { return *this; }
  size_t Hash() const {
    size_t h;
    std::memcpy(&h, &value_, std::min(sizeof(h), sizeof(value_)));
    return h;
  }
  istream &Read(istream &strm) { return ReadType(strm, &value_); }
  ostream &Write(ostream &strm) const { return WriteType(strm, value_); }

 private:
  T value_;
};

typedef TropicalWeightTpl<float> TropicalWeight;
typedef TropicalWeightTpl<float> StdWeight;

template <class T>
inline bool operator==(const TropicalWeightTpl<T> &a,
                       const TropicalWeightTpl<T> &b) {
  return a.Value() == b.Value();
}
template <class T>
inline bool operator!=(const TropicalWeightTpl<T> &a,
                       const TropicalWeightTpl<T> &b) {
  return a.Value() != b.Value();
}
template <class T>
inline TropicalWeightTpl<T> Plus(const TropicalWeightTpl<T> &a,
                                 const TropicalWeightTpl<T> &b) {
  return a.Value() < b.Value() ? a : b;
}
template <class T>
inline TropicalWeightTpl<T> Times(const TropicalWeightTpl<T> &a,
                                  const TropicalWeightTpl<T> &b) {
  if (!a.Member() || !b.Member()) return TropicalWeightTpl<T>::NoWeight();
  if (a == TropicalWeightTpl<T>::Zero() ||
      b == TropicalWeightTpl<T>::Zero())
    return TropicalWeightTpl<T>::Zero();
  return TropicalWeightTpl<T>(a.Value() + b.Value());
}
template <class T>
inline TropicalWeightTpl<T> Divide(const TropicalWeightTpl<T> &a,
                                   const TropicalWeightTpl<T> &b,
                                   DivideType typ = DIVIDE_ANY) {
  (void)typ;
  if (!a.Member() || !b.Member()) return TropicalWeightTpl<T>::NoWeight();
  if (b == TropicalWeightTpl<T>::Zero())
    return TropicalWeightTpl<T>::NoWeight();
  if (a == TropicalWeightTpl<T>::Zero())
    return TropicalWeightTpl<T>::Zero();
  return TropicalWeightTpl<T>(a.Value() - b.Value());
}
template <class T>
inline bool ApproxEqual(const TropicalWeightTpl<T> &a,
                        const TropicalWeightTpl<T> &b,
                        float delta = kDelta) {
  return a.Value() <= b.Value() + delta && b.Value() <= a.Value() + delta;
}
template <class T>
inline ostream &operator<<(ostream &strm, const TropicalWeightTpl<T> &w) {
  if (w.Value() == std::numeric_limits<T>::infinity()) return strm << "Infinity";
  if (w.Value() == -std::numeric_limits<T>::infinity())
    return strm << "-Infinity";
  if (w.Value() != w.Value()) return strm << "BadNumber";
  return strm << w.Value();
}
template <class T>
inline istream &operator>>(istream &strm, TropicalWeightTpl<T> &w) {
  string s;
  strm >> s;
  if (s == "Infinity") {
    w = TropicalWeightTpl<T>(std::numeric_limits<T>::infinity());
  } else if (s == "-Infinity") {
    w = TropicalWeightTpl<T>(-std::numeric_limits<T>::infinity());
  } else {
    char *p = nullptr;
    double d = strtod(s.c_str(), &p);
    if (p == s.c_str()) strm.setstate(std::ios::badbit);
    w = TropicalWeightTpl<T>(static_cast<T>(d));
  }
  return strm;
}

// minimal PairWeight (base of LexicographicWeight in real OpenFst);
// lattice-weight.h's ScaleTupleWeight operates on it
template <class W1, class W2>
class PairWeight {
 public:
  typedef PairWeight ReverseWeight;
  PairWeight() {}
  PairWeight(const W1 &w1, const W2 &w2) : value1_(w1), value2_(w2) {}
  const W1 &Value1() const { return value1_; }
  const W2 &Value2() const { return value2_; }
  void SetValue1(const W1 &w) { value1_ = w; }
  void SetValue2(const W2 &w) { value2_ = w; }
  static const PairWeight Zero() {
    return PairWeight(W1::Zero(), W2::Zero());
  }
  static const PairWeight One() {
    return PairWeight(W1::One(), W2::One());
  }

 private:
  W1 value1_;
  W2 value2_;
};

template <class W1, class W2>
inline bool operator==(const PairWeight<W1, W2> &a,
                       const PairWeight<W1, W2> &b) {
  return a.Value1() == b.Value1() && a.Value2() == b.Value2();
}

template <class W>
class NaturalLess {
 public:
  bool operator()(const W &a, const W &b) const {
    return (Plus(a, b) == a) && a != b;
  }
};

// OpenFst base/compat down_cast
template <typename To, typename From>
inline To down_cast(From *f) {
  return static_cast<To>(f);
}

// ---------------------------------------------------------------------
// Arc
// ---------------------------------------------------------------------

template <class W>
class ArcTpl {
 public:
  typedef W Weight;
  typedef int Label;
  typedef int StateId;

  Label ilabel;
  Label olabel;
  Weight weight;
  StateId nextstate;

  ArcTpl() : ilabel(0), olabel(0), weight(Weight::One()), nextstate(0) {}
  ArcTpl(Label i, Label o, const Weight &w, StateId s)
      : ilabel(i), olabel(o), weight(w), nextstate(s) {}

  static const string &Type() {
    static const string type =
        (W::Type() == "tropical") ? "standard" : W::Type();
    return type;
  }
};

typedef ArcTpl<TropicalWeight> StdArc;

// ---------------------------------------------------------------------
// SymbolTable (word symbol files: "sym id" lines)
// ---------------------------------------------------------------------

class SymbolTable {
 public:
  explicit SymbolTable(const string &name = "symbols") : name_(name) {}

  static SymbolTable *ReadText(const string &filename) {
    std::ifstream in(filename.c_str());
    if (!in) return nullptr;
    SymbolTable *tab = new SymbolTable(filename);
    string line;
    while (std::getline(in, line)) {
      std::istringstream iss(line);
      string sym;
      int64 id;
      if (iss >> sym >> id) tab->AddSymbol(sym, id);
    }
    return tab;
  }

  int64 AddSymbol(const string &sym, int64 id) {
    sym_to_id_[sym] = id;
    id_to_sym_[id] = sym;
    return id;
  }
  int64 AddSymbol(const string &sym) {
    auto it = sym_to_id_.find(sym);
    if (it != sym_to_id_.end()) return it->second;
    int64 id = id_to_sym_.empty() ? 0 : id_to_sym_.rbegin()->first + 1;
    return AddSymbol(sym, id);
  }
  // OpenFst 1.3 API: Find(key) -> symbol ("" if absent),
  // Find(symbol) -> key (-1 if absent)
  string Find(int64 id) const {
    auto it = id_to_sym_.find(id);
    return it == id_to_sym_.end() ? "" : it->second;
  }
  int64 Find(const string &sym) const {
    auto it = sym_to_id_.find(sym);
    return it == sym_to_id_.end() ? -1 : it->second;
  }
  bool WriteText(ostream &os) const {
    for (auto &kv : id_to_sym_) os << kv.second << '\t' << kv.first << '\n';
    return bool(os);
  }
  const string &Name() const { return name_; }
  size_t NumSymbols() const { return sym_to_id_.size(); }
  SymbolTable *Copy() const { return new SymbolTable(*this); }

 private:
  string name_;
  std::unordered_map<string, int64> sym_to_id_;
  std::map<int64, string> id_to_sym_;
};

// ---------------------------------------------------------------------
// FstHeader + read/write options
// ---------------------------------------------------------------------

const int32 kFstMagicNumber = 2125659606;

class FstHeader {
 public:
  FstHeader()
      : version_(0), flags_(0), properties_(0), start_(kNoStateId),
        numstates_(0), numarcs_(0) {}

  const string &FstType() const { return fsttype_; }
  const string &ArcType() const { return arctype_; }
  int32 Version() const { return version_; }
  int32 GetFlags() const { return flags_; }
  uint64 Properties() const { return properties_; }
  int64 Start() const { return start_; }
  int64 NumStates() const { return numstates_; }
  int64 NumArcs() const { return numarcs_; }

  void SetFstType(const string &t) { fsttype_ = t; }
  void SetArcType(const string &t) { arctype_ = t; }
  void SetVersion(int32 v) { version_ = v; }
  void SetFlags(int32 f) { flags_ = f; }
  void SetProperties(uint64 p) { properties_ = p; }
  void SetStart(int64 s) { start_ = s; }
  void SetNumStates(int64 n) { numstates_ = n; }
  void SetNumArcs(int64 n) { numarcs_ = n; }

  bool Read(istream &strm, const string &source) {
    int32 magic = 0;
    ReadType(strm, &magic);
    if (magic != kFstMagicNumber) {
      std::cerr << "FstHeader::Read: bad FST header: " << source
                << std::endl;
      return false;
    }
    ReadType(strm, &fsttype_);
    ReadType(strm, &arctype_);
    ReadType(strm, &version_);
    ReadType(strm, &flags_);
    ReadType(strm, &properties_);
    ReadType(strm, &start_);
    ReadType(strm, &numstates_);
    ReadType(strm, &numarcs_);
    return bool(strm);
  }

  bool Write(ostream &strm, const string &source) const {
    (void)source;
    WriteType(strm, kFstMagicNumber);
    WriteType(strm, fsttype_);
    WriteType(strm, arctype_);
    WriteType(strm, version_);
    WriteType(strm, flags_);
    WriteType(strm, properties_);
    WriteType(strm, start_);
    WriteType(strm, numstates_);
    WriteType(strm, numarcs_);
    return bool(strm);
  }

 private:
  string fsttype_;
  string arctype_;
  int32 version_;
  int32 flags_;
  uint64 properties_;
  int64 start_;
  int64 numstates_;
  int64 numarcs_;
};

struct FstReadOptions {
  string source;
  const FstHeader *header;
  explicit FstReadOptions(const string &src = "<unspecified>",
                          const FstHeader *hdr = nullptr)
      : source(src), header(hdr) {}
};

struct FstWriteOptions {
  string source;
  bool write_header;
  bool write_isymbols;
  bool write_osymbols;
  explicit FstWriteOptions(const string &src = "<unspecified>",
                           bool hdr = true, bool isym = true,
                           bool osym = true)
      : source(src), write_header(hdr), write_isymbols(isym),
        write_osymbols(osym) {}
};

// ---------------------------------------------------------------------
// Fst class hierarchy
// ---------------------------------------------------------------------

template <class A>
struct ArcIteratorData {
  const A *arcs;
  size_t narcs;
};

template <class A>
class Fst {
 public:
  typedef A Arc;
  typedef typename A::Weight Weight;
  typedef typename A::StateId StateId;

  virtual ~Fst() {}
  virtual StateId Start() const = 0;
  virtual Weight Final(StateId s) const = 0;
  virtual size_t NumArcs(StateId s) const = 0;
  virtual size_t NumInputEpsilons(StateId s) const = 0;
  virtual uint64 Properties(uint64 mask, bool test) const = 0;
  virtual const string &Type() const = 0;
  virtual Fst<A> *Copy(bool safe = false) const = 0;
  virtual const SymbolTable *InputSymbols() const = 0;
  virtual const SymbolTable *OutputSymbols() const = 0;
  virtual void InitArcIterator(StateId s,
                               ArcIteratorData<A> *data) const = 0;
};

template <class A>
class ExpandedFst : public Fst<A> {
 public:
  typedef typename A::StateId StateId;
  virtual StateId NumStates() const = 0;
  // covariant Copy like the real OpenFst hierarchy
  ExpandedFst<A> *Copy(bool safe = false) const override = 0;
};

template <class A>
class MutableFst : public ExpandedFst<A> {
 public:
  typedef typename A::Weight Weight;
  typedef typename A::StateId StateId;
  MutableFst<A> *Copy(bool safe = false) const override = 0;
  virtual void SetStart(StateId s) = 0;
  virtual void SetFinal(StateId s, Weight w) = 0;
  virtual StateId AddState() = 0;
  virtual void AddArc(StateId s, const A &arc) = 0;
  virtual void DeleteStates() = 0;
  virtual void DeleteArcs(StateId s) = 0;
  virtual void SetProperties(uint64 props, uint64 mask) = 0;
  virtual void ReserveStates(StateId n) { (void)n; }
  virtual void SetInputSymbols(const SymbolTable *syms) { (void)syms; }
  virtual void SetOutputSymbols(const SymbolTable *syms) { (void)syms; }
  // shim-specific: direct mutable access for MutableArcIterator
  virtual vector<A> &MutableArcs(StateId s) = 0;
};

template <class A>
class VectorFst : public MutableFst<A> {
 public:
  typedef A Arc;
  typedef typename A::Weight Weight;
  typedef typename A::StateId StateId;

  VectorFst() : start_(kNoStateId) {}
  VectorFst(const VectorFst &other) = default;
  // conversion copy from any Fst (used as VectorFst<A> v(fst))
  explicit VectorFst(const Fst<A> &other) : start_(kNoStateId) {
    // copy by enumerating states; requires other to be expanded in
    // practice (all our inputs are VectorFsts)
    const ExpandedFst<A> *ex =
        dynamic_cast<const ExpandedFst<A> *>(&other);
    if (ex == nullptr) {
      std::cerr << "VectorFst: copy from non-expanded Fst unsupported"
                << std::endl;
      std::abort();
    }
    StateId n = ex->NumStates();
    states_.resize(n);
    for (StateId s = 0; s < n; ++s) {
      states_[s].final = other.Final(s);
      ArcIteratorData<A> d;
      other.InitArcIterator(s, &d);
      states_[s].arcs.assign(d.arcs, d.arcs + d.narcs);
    }
    start_ = other.Start();
  }
  VectorFst &operator=(const VectorFst &other) = default;
  VectorFst &operator=(const Fst<A> &other) {
    VectorFst<A> tmp(other);
    *this = tmp;
    return *this;
  }

  StateId Start() const override { return start_; }
  Weight Final(StateId s) const override {
    return s < (StateId)states_.size() ? states_[s].final : Weight::Zero();
  }
  StateId NumStates() const override {
    return static_cast<StateId>(states_.size());
  }
  size_t NumArcs(StateId s) const override { return states_[s].arcs.size(); }
  size_t NumInputEpsilons(StateId s) const override {
    size_t n = 0;
    for (auto &a : states_[s].arcs) n += (a.ilabel == 0);
    return n;
  }
  uint64 Properties(uint64 mask, bool test) const override {
    (void)test;
    uint64 known = kExpanded | kMutable;
    if (mask & kTopSorted) {
      bool ts = true;
      for (StateId s = 0; s < NumStates() && ts; ++s)
        for (auto &a : states_[s].arcs)
          if (a.nextstate <= s) { ts = false; break; }
      if (ts) known |= kTopSorted;
    }
    if (mask & kAcyclic) {
      if (Properties(kTopSorted, true) & kTopSorted) known |= kAcyclic;
    }
    return known & mask;
  }
  const string &Type() const override {
    static const string type = "vector";
    return type;
  }
  VectorFst<A> *Copy(bool safe = false) const override {
    (void)safe;
    return new VectorFst<A>(*this);
  }
  const SymbolTable *InputSymbols() const override { return nullptr; }
  const SymbolTable *OutputSymbols() const override { return nullptr; }
  void InitArcIterator(StateId s,
                       ArcIteratorData<A> *data) const override {
    data->arcs = states_[s].arcs.data();
    data->narcs = states_[s].arcs.size();
  }

  void SetStart(StateId s) override { start_ = s; }
  void SetFinal(StateId s, Weight w) override { states_[s].final = w; }
  StateId AddState() override {
    states_.emplace_back();
    return static_cast<StateId>(states_.size()) - 1;
  }
  void AddArc(StateId s, const A &arc) override {
    states_[s].arcs.push_back(arc);
  }
  void DeleteStates() override {
    states_.clear();
    start_ = kNoStateId;
  }
  // delete the listed states (used by Connect)
  void DeleteStates(const vector<StateId> &dstates) {
    vector<StateId> newid(states_.size());
    vector<bool> dead(states_.size(), false);
    for (StateId s : dstates) dead[s] = true;
    StateId nn = 0;
    for (StateId s = 0; s < (StateId)states_.size(); ++s)
      newid[s] = dead[s] ? kNoStateId : nn++;
    vector<State> ns;
    ns.reserve(nn);
    for (StateId s = 0; s < (StateId)states_.size(); ++s) {
      if (dead[s]) continue;
      State st;
      st.final = states_[s].final;
      for (auto &a : states_[s].arcs) {
        if (a.nextstate != kNoStateId && !dead[a.nextstate]) {
          A na = a;
          na.nextstate = newid[a.nextstate];
          st.arcs.push_back(na);
        }
      }
      ns.push_back(std::move(st));
    }
    states_.swap(ns);
    start_ = (start_ != kNoStateId && !dead[start_]) ? newid[start_]
                                                     : kNoStateId;
  }
  void DeleteArcs(StateId s) override { states_[s].arcs.clear(); }
  void SetProperties(uint64 props, uint64 mask) override {
    (void)props;
    (void)mask;
  }
  void ReserveStates(StateId n) override { states_.reserve(n); }

  vector<A> &MutableArcs(StateId s) override { return states_[s].arcs; }

  // ---- binary IO (OpenFst VectorFst layout) ----
  bool Write(ostream &strm, const FstWriteOptions &opts) const {
    (void)opts;
    FstHeader hdr;
    hdr.SetFstType("vector");
    hdr.SetArcType(A::Type());
    hdr.SetVersion(2);
    hdr.SetFlags(0);
    hdr.SetProperties(kExpanded | kMutable);
    hdr.SetStart(start_);
    hdr.SetNumStates(NumStates());
    int64 narcs = 0;
    for (auto &st : states_) narcs += st.arcs.size();
    hdr.SetNumArcs(narcs);
    hdr.Write(strm, opts.source);
    for (auto &st : states_) {
      st.final.Write(strm);
      int64 n = st.arcs.size();
      WriteType(strm, n);
      for (auto &a : st.arcs) {
        WriteType(strm, (int32)a.ilabel);
        WriteType(strm, (int32)a.olabel);
        a.weight.Write(strm);
        WriteType(strm, (int32)a.nextstate);
      }
    }
    return bool(strm);
  }
  bool Write(const string &filename) const {
    std::ofstream out(filename.c_str(),
                      std::ios::out | std::ios::binary);
    return Write(out, FstWriteOptions(filename));
  }

  static VectorFst<A> *Read(istream &strm, const FstReadOptions &opts) {
    FstHeader local_hdr;
    const FstHeader *hdr = opts.header;
    if (hdr == nullptr) {
      if (!local_hdr.Read(strm, opts.source)) return nullptr;
      hdr = &local_hdr;
    }
    if (hdr->FstType() != "vector" || hdr->ArcType() != A::Type()) {
      std::cerr << "VectorFst::Read: type mismatch: " << hdr->FstType()
                << "/" << hdr->ArcType() << " want vector/" << A::Type()
                << std::endl;
      return nullptr;
    }
    VectorFst<A> *f = new VectorFst<A>();
    int64 nstates = hdr->NumStates();
    f->states_.resize(nstates);
    for (int64 s = 0; s < nstates; ++s) {
      f->states_[s].final.Read(strm);
      int64 narcs = 0;
      ReadType(strm, &narcs);
      f->states_[s].arcs.resize(narcs);
      for (int64 i = 0; i < narcs; ++i) {
        A &a = f->states_[s].arcs[i];
        int32 il, ol, ns;
        ReadType(strm, &il);
        ReadType(strm, &ol);
        a.weight.Read(strm);
        ReadType(strm, &ns);
        a.ilabel = il;
        a.olabel = ol;
        a.nextstate = ns;
      }
    }
    f->start_ = static_cast<StateId>(hdr->Start());
    if (!strm) {
      delete f;
      return nullptr;
    }
    return f;
  }
  static VectorFst<A> *Read(const string &filename) {
    std::ifstream in(filename.c_str(),
                     std::ios::in | std::ios::binary);
    if (!in) {
      std::cerr << "VectorFst::Read: can't open " << filename
                << std::endl;
      return nullptr;
    }
    return Read(in, FstReadOptions(filename));
  }

 private:
  struct State {
    Weight final = Weight::Zero();
    vector<A> arcs;
  };
  vector<State> states_;
  StateId start_;
};

// ---------------------------------------------------------------------
// iterators
// ---------------------------------------------------------------------

template <class F>
class StateIterator {
 public:
  typedef typename F::Arc::StateId StateId;
  explicit StateIterator(const F &fst)
      : n_(CountStates(fst)), s_(0) {}
  bool Done() const { return s_ >= n_; }
  StateId Value() const { return s_; }
  void Next() { ++s_; }
  void Reset() { s_ = 0; }

 private:
  static StateId CountStates(const F &fst) {
    const ExpandedFst<typename F::Arc> *ex =
        dynamic_cast<const ExpandedFst<typename F::Arc> *>(&fst);
    return ex ? ex->NumStates() : 0;
  }
  StateId n_, s_;
};

template <class F>
class ArcIterator {
 public:
  typedef typename F::Arc Arc;
  ArcIterator(const F &fst, typename Arc::StateId s) : i_(0) {
    fst.InitArcIterator(s, &data_);
  }
  bool Done() const { return i_ >= data_.narcs; }
  const Arc &Value() const { return data_.arcs[i_]; }
  void Next() { ++i_; }
  void Reset() { i_ = 0; }
  void Seek(size_t i) { i_ = i; }
  size_t Position() const { return i_; }

 private:
  ArcIteratorData<Arc> data_;
  size_t i_;
};

template <class F>
class MutableArcIterator {
 public:
  typedef typename F::Arc Arc;
  MutableArcIterator(F *fst, typename Arc::StateId s)
      : arcs_(&fst->MutableArcs(s)), i_(0) {}
  bool Done() const { return i_ >= arcs_->size(); }
  const Arc &Value() const { return (*arcs_)[i_]; }
  void SetValue(const Arc &arc) { (*arcs_)[i_] = arc; }
  void Next() { ++i_; }
  void Reset() { i_ = 0; }
  void Seek(size_t i) { i_ = i; }
  size_t Position() const { return i_; }

 private:
  vector<Arc> *arcs_;
  size_t i_;
};

// ---------------------------------------------------------------------
// algorithms
// ---------------------------------------------------------------------

// accessible/coaccessible trim
template <class A>
void Connect(VectorFst<A> *fst) {
  typedef typename A::StateId StateId;
  StateId n = fst->NumStates();
  if (n == 0) return;
  vector<bool> acc(n, false), coacc(n, false);
  // forward reachability from start
  if (fst->Start() != kNoStateId) {
    vector<StateId> stack{fst->Start()};
    acc[fst->Start()] = true;
    while (!stack.empty()) {
      StateId s = stack.back();
      stack.pop_back();
      for (ArcIterator<VectorFst<A>> ai(*fst, s); !ai.Done(); ai.Next()) {
        StateId t = ai.Value().nextstate;
        if (!acc[t]) {
          acc[t] = true;
          stack.push_back(t);
        }
      }
    }
  }
  // backward from finals
  vector<vector<StateId>> preds(n);
  for (StateId s = 0; s < n; ++s)
    for (ArcIterator<VectorFst<A>> ai(*fst, s); !ai.Done(); ai.Next())
      preds[ai.Value().nextstate].push_back(s);
  vector<StateId> stack;
  for (StateId s = 0; s < n; ++s)
    if (fst->Final(s) != A::Weight::Zero()) {
      coacc[s] = true;
      stack.push_back(s);
    }
  while (!stack.empty()) {
    StateId s = stack.back();
    stack.pop_back();
    for (StateId p : preds[s])
      if (!coacc[p]) {
        coacc[p] = true;
        stack.push_back(p);
      }
  }
  vector<StateId> dstates;
  for (StateId s = 0; s < n; ++s)
    if (!(acc[s] && coacc[s])) dstates.push_back(s);
  if (!dstates.empty()) fst->DeleteStates(dstates);
}

template <class A>
void Connect(MutableFst<A> *fst) {
  Connect(static_cast<VectorFst<A> *>(fst));
}

// topological sort; returns false on cycles (fst left in error state)
template <class A>
bool TopSort(VectorFst<A> *fst) {
  typedef typename A::StateId StateId;
  StateId n = fst->NumStates();
  vector<int> indeg(n, 0);
  for (StateId s = 0; s < n; ++s)
    for (ArcIterator<VectorFst<A>> ai(*fst, s); !ai.Done(); ai.Next())
      indeg[ai.Value().nextstate]++;
  vector<StateId> order;
  order.reserve(n);
  vector<StateId> q;
  for (StateId s = 0; s < n; ++s)
    if (indeg[s] == 0) q.push_back(s);
  while (!q.empty()) {
    StateId s = q.back();
    q.pop_back();
    order.push_back(s);
    for (ArcIterator<VectorFst<A>> ai(*fst, s); !ai.Done(); ai.Next())
      if (--indeg[ai.Value().nextstate] == 0)
        q.push_back(ai.Value().nextstate);
  }
  if ((StateId)order.size() != n) return false;  // cyclic
  vector<StateId> newid(n);
  for (StateId i = 0; i < n; ++i) newid[order[i]] = i;
  // rebuild in sorted order
  VectorFst<A> out;
  out.ReserveStates(n);
  for (StateId i = 0; i < n; ++i) out.AddState();
  for (StateId s = 0; s < n; ++s) {
    out.SetFinal(newid[s], fst->Final(s));
    for (ArcIterator<VectorFst<A>> ai(*fst, s); !ai.Done(); ai.Next()) {
      A a = ai.Value();
      a.nextstate = newid[a.nextstate];
      out.AddArc(newid[s], a);
    }
  }
  if (fst->Start() != kNoStateId) out.SetStart(newid[fst->Start()]);
  *fst = out;
  return true;
}

template <class A>
bool TopSort(MutableFst<A> *fst) {
  return TopSort(static_cast<VectorFst<A> *>(fst));
}

template <class A>
class ILabelCompare {
 public:
  bool operator()(const A &a, const A &b) const {
    return a.ilabel < b.ilabel;
  }
  uint64 Properties(uint64 props) const { return props; }
};

template <class A>
class OLabelCompare {
 public:
  bool operator()(const A &a, const A &b) const {
    return a.olabel < b.olabel;
  }
  uint64 Properties(uint64 props) const { return props; }
};

template <class A, class Compare>
void ArcSort(VectorFst<A> *fst, const Compare &comp) {
  for (typename A::StateId s = 0; s < fst->NumStates(); ++s) {
    auto &arcs = fst->MutableArcs(s);
    std::stable_sort(arcs.begin(), arcs.end(), comp);
  }
}

template <class A, class Compare>
void ArcSort(MutableFst<A> *fst, const Compare &comp) {
  ArcSort(static_cast<VectorFst<A> *>(fst), comp);
}

template <class A>
void Invert(VectorFst<A> *fst) {
  for (typename A::StateId s = 0; s < fst->NumStates(); ++s)
    for (auto &a : fst->MutableArcs(s)) std::swap(a.ilabel, a.olabel);
}

template <class A>
void Invert(MutableFst<A> *fst) {
  Invert(static_cast<VectorFst<A> *>(fst));
}

// single shortest path (n=1) for idempotent path semirings
// (LatticeWeight/TropicalWeight); the decoder's GetBestPath calls this
// on the raw lattice.  Works on any input (Bellman-Ford relaxation —
// raw lattices are acyclic so this converges in <= V sweeps).
template <class A>
void ShortestPath(const Fst<A> &ifst, MutableFst<A> *ofst, size_t n = 1) {
  typedef typename A::Weight Weight;
  typedef typename A::StateId StateId;
  CHECK(n == 1);
  ofst->DeleteStates();
  const ExpandedFst<A> *ex = dynamic_cast<const ExpandedFst<A> *>(&ifst);
  CHECK(ex != nullptr);
  StateId num = ex->NumStates();
  if (num == 0 || ifst.Start() == kNoStateId) return;
  vector<Weight> dist(num, Weight::Zero());
  vector<std::pair<StateId, int>> back(num, {kNoStateId, -1});
  dist[ifst.Start()] = Weight::One();
  NaturalLess<Weight> less;
  bool changed = true;
  for (StateId sweep = 0; sweep <= num && changed; ++sweep) {
    changed = false;
    for (StateId s = 0; s < num; ++s) {
      if (dist[s] == Weight::Zero()) continue;
      int ai = 0;
      for (ArcIterator<Fst<A>> it(ifst, s); !it.Done(); it.Next(), ++ai) {
        const A &a = it.Value();
        Weight nd = Times(dist[s], a.weight);
        if (dist[a.nextstate] == Weight::Zero() ||
            less(nd, dist[a.nextstate])) {
          dist[a.nextstate] = nd;
          back[a.nextstate] = {s, ai};
          changed = true;
        }
      }
    }
  }
  // best final state
  StateId best = kNoStateId;
  Weight best_w = Weight::Zero();
  for (StateId s = 0; s < num; ++s) {
    if (dist[s] == Weight::Zero()) continue;
    Weight f = ifst.Final(s);
    if (f == Weight::Zero()) continue;
    Weight tot = Times(dist[s], f);
    if (best == kNoStateId || less(tot, best_w)) {
      best = s;
      best_w = tot;
    }
  }
  if (best == kNoStateId) return;  // no successful path -> empty fst
  // trace back the arc sequence
  vector<A> path;
  StateId s = best;
  while (s != ifst.Start()) {
    StateId p = back[s].first;
    ArcIterator<Fst<A>> it(ifst, p);
    it.Seek(back[s].second);
    path.push_back(it.Value());
    s = p;
  }
  std::reverse(path.begin(), path.end());
  StateId cur = ofst->AddState();
  ofst->SetStart(cur);
  for (auto &a : path) {
    StateId nxt = ofst->AddState();
    A na = a;
    na.nextstate = nxt;
    ofst->AddArc(cur, na);
    cur = nxt;
  }
  ofst->SetFinal(cur, ifst.Final(best));
}

// ---------------------------------------------------------------------
// FstPrinter (text output; used by text-mode lattice writing)
// ---------------------------------------------------------------------

template <class A>
class FstPrinter {
 public:
  typedef typename A::Weight Weight;
  typedef typename A::StateId StateId;

  FstPrinter(const Fst<A> &fst, const SymbolTable *isyms,
             const SymbolTable *osyms, const SymbolTable *ssyms,
             bool acceptor, bool show_weight_one,
             const string &sep = "\t")
      : fst_(fst), isyms_(isyms), osyms_(osyms), ssyms_(ssyms),
        acceptor_(acceptor), show_weight_one_(show_weight_one),
        sep_(sep) {}

  void Print(ostream *os, const string &dest) {
    (void)dest;
    const ExpandedFst<A> *ex =
        dynamic_cast<const ExpandedFst<A> *>(&fst_);
    if (ex == nullptr || fst_.Start() == kNoStateId) return;
    StateId n = ex->NumStates();
    // start state prints first (swap ids 0 <-> start in the output)
    StateId start = fst_.Start();
    auto pid = [&](StateId s) -> StateId {
      if (s == start) return 0;
      if (s == 0) return start;
      return s;
    };
    vector<StateId> order;
    order.push_back(start);
    for (StateId s = 0; s < n; ++s)
      if (s != start) order.push_back(s);
    for (StateId s : order) {
      for (ArcIterator<Fst<A>> ai(fst_, s); !ai.Done(); ai.Next()) {
        const A &a = ai.Value();
        *os << pid(s) << sep_ << pid(a.nextstate) << sep_
            << Sym(isyms_, a.ilabel);
        if (!acceptor_) *os << sep_ << Sym(osyms_, a.olabel);
        if (show_weight_one_ || !(a.weight == Weight::One()))
          *os << sep_ << a.weight;
        *os << '\n';
      }
      Weight f = fst_.Final(s);
      if (!(f == Weight::Zero())) {
        *os << pid(s);
        if (show_weight_one_ || !(f == Weight::One()))
          *os << sep_ << f;
        *os << '\n';
      }
    }
  }

 private:
  string Sym(const SymbolTable *t, int label) const {
    if (t == nullptr) {
      std::ostringstream ss;
      ss << label;
      return ss.str();
    }
    return t->Find((int64)label);
  }
  const Fst<A> &fst_;
  const SymbolTable *isyms_, *osyms_, *ssyms_;
  bool acceptor_, show_weight_one_;
  string sep_;
};

}  // namespace fst

#endif  // MINIFST_FSTLIB_H_
