// Minimal Boost.uBLAS stand-in (test infrastructure only).
//
// Boost is not installed in this environment; this shim implements the
// exact surface /root/reference/tools/kitti-eval/*.cpp touch —
// matrix<double>(2,N), element access, data().begin(), prod() — so the
// REFERENCE evaluator can be compiled here and fuzz-compared against our
// own tools/kitti-eval/kitti_eval.cpp (the last unverified oracle,
// VERDICT r3 missing #3).  Not a general library; do not reuse.
#ifndef BOOST_UBLAS_MATRIX_SHIM_HPP
#define BOOST_UBLAS_MATRIX_SHIM_HPP

#include <cstddef>
#include <vector>

namespace boost { namespace numeric { namespace ublas {

template <typename T>
class matrix {
 public:
  matrix(std::size_t rows, std::size_t cols)
      : rows_(rows), cols_(cols), data_(rows * cols, T()) {}

  T &operator()(std::size_t i, std::size_t j) {
    return data_[i * cols_ + j];
  }
  const T &operator()(std::size_t i, std::size_t j) const {
    return data_[i * cols_ + j];
  }
  std::size_t size1() const { return rows_; }
  std::size_t size2() const { return cols_; }

  // reference code copies raw row-major data via data().begin()
  std::vector<T> &data() { return data_; }
  const std::vector<T> &data() const { return data_; }

 private:
  std::size_t rows_, cols_;
  std::vector<T> data_;
};

template <typename T>
matrix<T> prod(const matrix<T> &a, const matrix<T> &b) {
  matrix<T> out(a.size1(), b.size2());
  for (std::size_t i = 0; i < a.size1(); ++i)
    for (std::size_t j = 0; j < b.size2(); ++j) {
      T acc = T();
      for (std::size_t k = 0; k < a.size2(); ++k) acc += a(i, k) * b(k, j);
      out(i, j) = acc;
    }
  return out;
}

}}}  // namespace boost::numeric::ublas

#endif  // BOOST_UBLAS_MATRIX_SHIM_HPP
