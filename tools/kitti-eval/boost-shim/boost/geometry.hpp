// Minimal Boost.Geometry stand-in (test infrastructure only).
//
// Implements ONLY what the reference KITTI evaluators use on convex
// BEV rectangles: model::polygon over model::d2::point_xy, append() of a
// closed double[N][2] ring, area(), intersection() and union_() of two
// convex polygons.  Intersection is Sutherland–Hodgman (convex clip —
// exact for two convex quads); union area comes from inclusion–exclusion
// and rides inside the returned polygon as a fixed area, since the
// callers only ever take area(un.front()).
//
// Purpose: compile /root/reference/tools/kitti-eval/*.cpp in this
// Boost-less environment so its numbers can be fuzz-compared against our
// from-scratch tools/kitti-eval/kitti_eval.cpp (VERDICT r3 missing #3).
#ifndef BOOST_GEOMETRY_SHIM_HPP
#define BOOST_GEOMETRY_SHIM_HPP

#include <cmath>
#include <cstddef>
#include <vector>

// the reference invokes this registration macro at file scope with no
// trailing semicolon; the shim's append() overload already handles
// c-arrays, so expand to a harmless complete declaration
#define BOOST_GEOMETRY_REGISTER_C_ARRAY_CS(CS) \
  namespace boost_geometry_shim_dummy {}

namespace boost { namespace geometry {

namespace cs { struct cartesian {}; }

namespace model {
namespace d2 {
template <typename T>
struct point_xy {
  T x_, y_;
  point_xy() : x_(T()), y_(T()) {}
  point_xy(T x, T y) : x_(x), y_(y) {}
};
}  // namespace d2

template <typename Point>
struct polygon {
  std::vector<Point> outer_;
  // union_() results carry their area directly (see header note)
  double fixed_area_ = -1.0;
};
}  // namespace model

// ---- area (shoelace; closed or open rings both work) ------------------
template <typename Point>
inline double area(const model::polygon<Point> &p) {
  if (p.fixed_area_ >= 0.0) return p.fixed_area_;
  const std::vector<Point> &v = p.outer_;
  if (v.size() < 3) return 0.0;
  double acc = 0.0;
  for (std::size_t i = 0; i < v.size(); ++i) {
    const Point &a = v[i];
    const Point &b = v[(i + 1) % v.size()];
    acc += a.x_ * b.y_ - b.x_ * a.y_;
  }
  return std::fabs(acc) * 0.5;
}

// ---- append a closed c-array ring --------------------------------------
template <typename Point, std::size_t N>
inline void append(model::polygon<Point> &poly, const double (&pts)[N][2]) {
  for (std::size_t i = 0; i < N; ++i)
    poly.outer_.push_back(Point(pts[i][0], pts[i][1]));
}

namespace detail {
template <typename Point>
inline std::vector<Point> open_ring(const std::vector<Point> &v) {
  std::vector<Point> r(v);
  while (r.size() > 1 && r.front().x_ == r.back().x_ &&
         r.front().y_ == r.back().y_)
    r.pop_back();
  return r;
}

// signed area of an open ring (orientation probe)
template <typename Point>
inline double signed_area(const std::vector<Point> &v) {
  double acc = 0.0;
  for (std::size_t i = 0; i < v.size(); ++i) {
    const Point &a = v[i];
    const Point &b = v[(i + 1) % v.size()];
    acc += a.x_ * b.y_ - b.x_ * a.y_;
  }
  return 0.5 * acc;
}

// Sutherland–Hodgman: clip convex `subject` by convex `clip`
template <typename Point>
inline std::vector<Point> convex_clip(std::vector<Point> subject,
                                      std::vector<Point> clip) {
  if (signed_area(clip) < 0.0) {           // orient clip CCW
    std::vector<Point> rev(clip.rbegin(), clip.rend());
    clip.swap(rev);
  }
  for (std::size_t e = 0; e < clip.size() && !subject.empty(); ++e) {
    const Point &c1 = clip[e];
    const Point &c2 = clip[(e + 1) % clip.size()];
    const double ex = c2.x_ - c1.x_, ey = c2.y_ - c1.y_;
    std::vector<Point> out;
    for (std::size_t i = 0; i < subject.size(); ++i) {
      const Point &p = subject[i];
      const Point &q = subject[(i + 1) % subject.size()];
      const double dp = ex * (p.y_ - c1.y_) - ey * (p.x_ - c1.x_);
      const double dq = ex * (q.y_ - c1.y_) - ey * (q.x_ - c1.x_);
      if (dp >= 0.0) out.push_back(p);
      if ((dp > 0.0 && dq < 0.0) || (dp < 0.0 && dq > 0.0)) {
        const double t = dp / (dp - dq);
        out.push_back(Point(p.x_ + t * (q.x_ - p.x_),
                            p.y_ + t * (q.y_ - p.y_)));
      }
    }
    subject.swap(out);
  }
  return subject;
}
}  // namespace detail

// ---- intersection of two convex polygons -------------------------------
template <typename Point>
inline void intersection(const model::polygon<Point> &a,
                         const model::polygon<Point> &b,
                         std::vector<model::polygon<Point> > &out) {
  std::vector<Point> inter = detail::convex_clip(
      detail::open_ring(a.outer_), detail::open_ring(b.outer_));
  if (inter.size() >= 3) {
    model::polygon<Point> p;
    p.outer_ = inter;
    if (area(p) > 0.0) out.push_back(p);
  }
}

// ---- union: callers only read area(un.front()) --------------------------
template <typename Point>
inline void union_(const model::polygon<Point> &a,
                   const model::polygon<Point> &b,
                   std::vector<model::polygon<Point> > &out) {
  std::vector<model::polygon<Point> > in;
  intersection(a, b, in);
  const double inter = in.empty() ? 0.0 : area(in.front());
  model::polygon<Point> u;
  u.fixed_area_ = area(a) + area(b) - inter;
  out.push_back(u);
}

}}  // namespace boost::geometry

#endif  // BOOST_GEOMETRY_SHIM_HPP
