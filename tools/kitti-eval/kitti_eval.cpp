// KITTI object-detection evaluation (AP / AOS / AP_BEV / AP_3D).
//
// Self-contained C++ implementation of the official evaluation protocol
// (behavioural spec: the vendored reference evaluator,
// /root/reference/tools/kitti-eval/evaluate_object_3d_offline_r40.cpp).
// No Boost: BEV rectangle intersection uses a Sutherland-Hodgman convex
// clipper.  Prints both R40 and R11 AP summaries and writes the
// stats_<class>_* files next to the results.
//
// Usage: ./evaluate_object_3d_offline <gt_dir> <result_dir>
//   with detections under <result_dir>/data/*.txt.
//
// Server mode (behavioural spec: the test-server variant,
// /root/reference/tools/kitti-eval/evaluate_object_3d.cpp): enabled by the
// --server[=N] flag or by invoking the binary under the name
// evaluate_object_3d.  Differences: a FIXED index range 0..N-1 (default
// 7518 test images) where every detection file must exist, and looser
// ground/3D overlap thresholds for pedestrians/cyclists (0.5/0.25/0.25).
// The reference's result-dir deletion is intentionally not reproduced.
//
// Notification (behavioural spec: the reference's Mail tee, mail.h:8-46,
// which prints every progress/summary line to stdout AND, when an email
// address is supplied, pipes the same lines through sendmail): enabled by
// --email=<addr>.  Offline-capable: when no sendmail binary exists on the
// host, the composed message (headers + the same lines) is written to
// <result_dir>/notification.txt instead, so the notification is captured
// rather than silently lost.

#include <algorithm>
#include <cctype>
#include <cerrno>
#include <cstdarg>
#include <cstdlib>
#include <cmath>
#include <cstdio>
#include <cstring>
#include <dirent.h>
#include <numeric>
#include <string>
#include <unistd.h>
#include <vector>

namespace {

constexpr int N_CLASS = 3;
const char *CLASS_NAMES[N_CLASS] = {"car", "pedestrian", "cyclist"};

constexpr double MIN_HEIGHT[3] = {40.0, 25.0, 25.0};
constexpr int MAX_OCCLUSION[3] = {0, 1, 2};
constexpr double MAX_TRUNCATION[3] = {0.15, 0.3, 0.5};
// rows: metric (image, ground, 3d); cols: class
constexpr double MIN_OVERLAP_OFFLINE[3][3] = {
    {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}, {0.7, 0.5, 0.5}};
// the test server uses looser BEV/3D gates for pedestrians and cyclists
// (evaluate_object_3d.cpp:54)
constexpr double MIN_OVERLAP_SERVER[3][3] = {
    {0.7, 0.5, 0.5}, {0.5, 0.25, 0.25}, {0.5, 0.25, 0.25}};
const double (*MIN_OVERLAP)[3] = MIN_OVERLAP_OFFLINE;
constexpr int N_TESTIMAGES = 7518;
constexpr int N_SAMPLE_PTS = 41;
constexpr double NO_DETECTION = -10000000.0;

enum Metric { IMAGE = 0, GROUND = 1, BOX3D = 2 };

struct Obj {
  std::string type;
  double truncation = -1, alpha = -10;
  int occlusion = -1;
  double x1 = -1, y1 = -1, x2 = -1, y2 = -1;
  double h = 0, w = 0, l = 0;
  double t1 = -1000, t2 = -1000, t3 = -1000;
  double ry = -10;
  double score = -1000;
};

struct Frame {
  std::vector<Obj> gt;
  std::vector<Obj> det;
};

bool iequals(const std::string &a, const char *b) {
  return strcasecmp(a.c_str(), b) == 0;
}

int class_index(const std::string &t) {
  for (int c = 0; c < N_CLASS; ++c)
    if (iequals(t, CLASS_NAMES[c])) return c;
  return -1;
}

// ---------------------------------------------------------------- parsing

bool load_file(const std::string &path, bool is_det, std::vector<Obj> *out,
               bool *aos_valid) {
  FILE *fp = fopen(path.c_str(), "r");
  if (!fp) return false;
  char type[256];
  while (!feof(fp)) {
    Obj o;
    double occ, trunc;
    int n;
    if (is_det) {
      n = fscanf(fp, "%255s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                     "%lf %lf %lf",
                 type, &trunc, &occ, &o.alpha, &o.x1, &o.y1, &o.x2, &o.y2,
                 &o.h, &o.w, &o.l, &o.t1, &o.t2, &o.t3, &o.ry, &o.score);
      if (n != 16) continue;
    } else {
      n = fscanf(fp, "%255s %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf %lf "
                     "%lf %lf",
                 type, &trunc, &occ, &o.alpha, &o.x1, &o.y1, &o.x2, &o.y2,
                 &o.h, &o.w, &o.l, &o.t1, &o.t2, &o.t3, &o.ry);
      if (n != 15) continue;
    }
    o.type = type;
    o.truncation = trunc;
    o.occlusion = static_cast<int>(occ);
    if (is_det && o.alpha == -10 && aos_valid) *aos_valid = false;
    out->push_back(o);
  }
  fclose(fp);
  return true;
}

// ---------------------------------------------------------------- overlaps

double image_overlap(const Obj &a, const Obj &b, int criterion) {
  double x1 = std::max(a.x1, b.x1), y1 = std::max(a.y1, b.y1);
  double x2 = std::min(a.x2, b.x2), y2 = std::min(a.y2, b.y2);
  double w = x2 - x1, h = y2 - y1;
  if (w <= 0 || h <= 0) return 0.0;
  double inter = w * h;
  double a_area = (a.x2 - a.x1) * (a.y2 - a.y1);
  double b_area = (b.x2 - b.x1) * (b.y2 - b.y1);
  if (criterion == 0) return inter / a_area;
  if (criterion == 1) return inter / b_area;
  return inter / (a_area + b_area - inter);
}

struct Pt {
  double x, z;
};

void bev_corners(const Obj &o, Pt out[4]) {
  const double c = std::cos(o.ry), s = std::sin(o.ry);
  const double xs[4] = {o.l / 2, o.l / 2, -o.l / 2, -o.l / 2};
  const double zs[4] = {o.w / 2, -o.w / 2, -o.w / 2, o.w / 2};
  for (int i = 0; i < 4; ++i) {
    out[i].x = c * xs[i] + s * zs[i] + o.t1;
    out[i].z = -s * xs[i] + c * zs[i] + o.t3;
  }
}

double polygon_area(const std::vector<Pt> &p) {
  if (p.size() < 3) return 0.0;
  double acc = 0;
  for (size_t i = 0; i < p.size(); ++i) {
    const Pt &u = p[i];
    const Pt &v = p[(i + 1) % p.size()];
    acc += u.x * v.z - u.z * v.x;
  }
  return std::fabs(acc) * 0.5;
}

double signed_area2(const Pt p[4]) {
  double acc = 0;
  for (int i = 0; i < 4; ++i) {
    const Pt &u = p[i];
    const Pt &v = p[(i + 1) % 4];
    acc += u.x * v.z - u.z * v.x;
  }
  return acc;
}

// Sutherland-Hodgman: clip convex quad `subject` by convex quad `clip`.
double quad_intersection_area(const Pt subject[4], Pt clip[4]) {
  double a2 = signed_area2(clip);
  // a fully degenerate clip quad (zero l and/or w collapses it to a line
  // or point) has no interior: every edge test would trivially pass and
  // the whole subject would be "inside"; the true intersection is empty
  if (a2 == 0) return 0.0;
  if (a2 < 0) std::swap(clip[0], clip[3]), std::swap(clip[1], clip[2]);
  std::vector<Pt> output(subject, subject + 4);
  for (int i = 0; i < 4 && !output.empty(); ++i) {
    const Pt a = clip[i];
    const Pt b = clip[(i + 1) % 4];
    std::vector<Pt> input;
    input.swap(output);
    auto inside = [&](const Pt &p) {
      return (b.x - a.x) * (p.z - a.z) - (b.z - a.z) * (p.x - a.x) >= 0;
    };
    auto intersect = [&](const Pt &p, const Pt &q) {
      double dx1 = q.x - p.x, dz1 = q.z - p.z;
      double dx2 = b.x - a.x, dz2 = b.z - a.z;
      double denom = dx1 * dz2 - dz1 * dx2;
      if (denom == 0) return q;
      double t = ((a.x - p.x) * dz2 - (a.z - p.z) * dx2) / denom;
      return Pt{p.x + t * dx1, p.z + t * dz1};
    };
    Pt s = input.back();
    for (const Pt &e : input) {
      if (inside(e)) {
        if (!inside(s)) output.push_back(intersect(s, e));
        output.push_back(e);
      } else if (inside(s)) {
        output.push_back(intersect(s, e));
      }
      s = e;
    }
  }
  return polygon_area(output);
}

double bev_intersection(const Obj &a, const Obj &b) {
  Pt pa[4], pb[4];
  bev_corners(a, pa);
  bev_corners(b, pb);
  return quad_intersection_area(pa, pb);
}

double ground_overlap(const Obj &a, const Obj &b, int criterion) {
  double inter = bev_intersection(a, b);
  double a_area = a.l * a.w, b_area = b.l * b.w;
  if (criterion == 0) return a_area > 0 ? inter / a_area : 0.0;
  if (criterion == 1) return b_area > 0 ? inter / b_area : 0.0;
  double uni = a_area + b_area - inter;
  return uni > 0 ? inter / uni : 0.0;
}

double box3d_overlap(const Obj &a, const Obj &b, int criterion) {
  double inter_area = bev_intersection(a, b);
  double ymax = std::min(a.t2, b.t2);
  double ymin = std::max(a.t2 - a.h, b.t2 - b.h);
  double inter = inter_area * std::max(0.0, ymax - ymin);
  double a_vol = a.h * a.l * a.w, b_vol = b.h * b.l * b.w;
  if (criterion == 0) return a_vol > 0 ? inter / a_vol : 0.0;
  if (criterion == 1) return b_vol > 0 ? inter / b_vol : 0.0;
  double uni = a_vol + b_vol - inter;
  return uni > 0 ? inter / uni : 0.0;
}

double overlap(Metric m, const Obj &det, const Obj &gt, int criterion) {
  switch (m) {
    case IMAGE: return image_overlap(det, gt, criterion);
    case GROUND: return ground_overlap(det, gt, criterion);
    default: return box3d_overlap(det, gt, criterion);
  }
}

// ---------------------------------------------------------------- protocol

struct Cleaned {
  std::vector<int> ignored_gt;   // 0 eval, 1 ignore, -1 other class
  std::vector<int> ignored_det;
  std::vector<Obj> dontcare;
  int n_gt = 0;
};

Cleaned clean_data(int cls, const Frame &f, int difficulty) {
  Cleaned c;
  for (const Obj &g : f.gt) {
    int valid;
    if (iequals(g.type, CLASS_NAMES[cls]))
      valid = 1;
    else if (cls == 1 /*pedestrian*/ && iequals(g.type, "Person_sitting"))
      valid = 0;
    else if (cls == 0 /*car*/ && iequals(g.type, "Van"))
      valid = 0;
    else
      valid = -1;
    bool ignore = g.occlusion > MAX_OCCLUSION[difficulty] ||
                  g.truncation > MAX_TRUNCATION[difficulty] ||
                  (g.y2 - g.y1) < MIN_HEIGHT[difficulty];
    if (valid == 1 && !ignore) {
      c.ignored_gt.push_back(0);
      c.n_gt++;
    } else if (valid == 0 || (ignore && valid == 1)) {
      c.ignored_gt.push_back(1);
    } else {
      c.ignored_gt.push_back(-1);
    }
    if (iequals(g.type, "DontCare")) c.dontcare.push_back(g);
  }
  for (const Obj &d : f.det) {
    int height = static_cast<int>(std::fabs(d.y1 - d.y2));
    if (height < MIN_HEIGHT[difficulty])
      c.ignored_det.push_back(1);
    else if (iequals(d.type, CLASS_NAMES[cls]))
      c.ignored_det.push_back(0);
    else
      c.ignored_det.push_back(-1);
  }
  return c;
}

struct Stat {
  int tp = 0, fp = 0, fn = 0;
  double similarity = 0;
  std::vector<double> scores;
};

// ``ovl`` (optional): precomputed det-major overlap matrix
// ovl[j * |gt| + i] = overlap(metric, det[j], gt[i], -1).  The matrix
// depends only on (metric, frame), but this function runs once per
// recall threshold per difficulty (up to 126x per frame) — recomputing
// the BEV clipper there dominated full-split runtime.
Stat compute_statistics(int cls, const Frame &f, const Cleaned &c,
                        bool compute_fp, Metric metric, bool compute_aos,
                        double thresh, const double *ovl = nullptr) {
  Stat st;
  const double min_ov = MIN_OVERLAP[metric][cls];
  std::vector<bool> assigned(f.det.size(), false);
  std::vector<bool> below(f.det.size(), false);
  std::vector<double> delta;
  if (compute_fp)
    for (size_t j = 0; j < f.det.size(); ++j)
      if (f.det[j].score < thresh) below[j] = true;

  for (size_t i = 0; i < f.gt.size(); ++i) {
    if (c.ignored_gt[i] == -1) continue;
    int det_idx = -1;
    double valid_detection = NO_DETECTION;
    double max_overlap = 0;
    bool assigned_ignored_det = false;
    for (size_t j = 0; j < f.det.size(); ++j) {
      if (c.ignored_det[j] == -1 || assigned[j] || below[j]) continue;
      double ov = ovl ? ovl[j * f.gt.size() + i]
                      : overlap(metric, f.det[j], f.gt[i], -1);
      if (!compute_fp && ov > min_ov && f.det[j].score > valid_detection) {
        det_idx = static_cast<int>(j);
        valid_detection = f.det[j].score;
      } else if (compute_fp && ov > min_ov &&
                 (ov > max_overlap || assigned_ignored_det) &&
                 c.ignored_det[j] == 0) {
        max_overlap = ov;
        det_idx = static_cast<int>(j);
        valid_detection = 1;
        assigned_ignored_det = false;
      } else if (compute_fp && ov > min_ov &&
                 valid_detection == NO_DETECTION && c.ignored_det[j] == 1) {
        det_idx = static_cast<int>(j);
        valid_detection = 1;
        assigned_ignored_det = true;
      }
    }
    if (valid_detection == NO_DETECTION && c.ignored_gt[i] == 0) {
      st.fn++;
    } else if (valid_detection != NO_DETECTION &&
               (c.ignored_gt[i] == 1 || c.ignored_det[det_idx] == 1)) {
      assigned[det_idx] = true;
    } else if (valid_detection != NO_DETECTION) {
      st.tp++;
      st.scores.push_back(f.det[det_idx].score);
      if (compute_aos) delta.push_back(f.gt[i].alpha - f.det[det_idx].alpha);
      assigned[det_idx] = true;
    }
  }

  if (compute_fp) {
    for (size_t j = 0; j < f.det.size(); ++j)
      if (!(assigned[j] || c.ignored_det[j] == -1 || c.ignored_det[j] == 1 ||
            below[j]))
        st.fp++;
    int nstuff = 0;
    for (const Obj &dc : c.dontcare) {
      for (size_t j = 0; j < f.det.size(); ++j) {
        if (assigned[j] || c.ignored_det[j] == -1 || c.ignored_det[j] == 1 ||
            below[j])
          continue;
        if (overlap(metric, f.det[j], dc, 0) > min_ov) {
          assigned[j] = true;
          nstuff++;
        }
      }
    }
    st.fp -= nstuff;
    if (compute_aos) {
      double acc = 0;
      for (double dl : delta) acc += (1.0 + std::cos(dl)) / 2.0;
      st.similarity = (st.tp > 0 || st.fp > 0) ? acc : -1;
    }
  }
  return st;
}

std::vector<double> get_thresholds(std::vector<double> scores, int n_gt) {
  std::vector<double> t;
  std::sort(scores.begin(), scores.end(), std::greater<double>());
  double current_recall = 0;
  for (size_t i = 0; i < scores.size(); ++i) {
    double l_recall = static_cast<double>(i + 1) / n_gt;
    double r_recall =
        i < scores.size() - 1 ? static_cast<double>(i + 2) / n_gt : l_recall;
    if ((r_recall - current_recall) < (current_recall - l_recall) &&
        i < scores.size() - 1)
      continue;
    t.push_back(scores[i]);
    current_recall += 1.0 / (N_SAMPLE_PTS - 1.0);
  }
  return t;
}

void eval_class(const std::vector<Frame> &frames, int cls, int difficulty,
                Metric metric, bool compute_aos,
                std::vector<double> *precision, std::vector<double> *aos,
                const std::vector<std::vector<double>> &ovl) {
  int n_gt = 0;
  std::vector<double> scores;
  std::vector<Cleaned> cleaned;
  cleaned.reserve(frames.size());
  for (const Frame &f : frames) {
    cleaned.push_back(clean_data(cls, f, difficulty));
    n_gt += cleaned.back().n_gt;
    Stat st = compute_statistics(cls, f, cleaned.back(), false, metric,
                                 false, 0, ovl[&f - frames.data()].data());
    scores.insert(scores.end(), st.scores.begin(), st.scores.end());
  }
  std::vector<double> thresholds = get_thresholds(scores, n_gt);
  std::vector<Stat> agg(thresholds.size());
  for (size_t i = 0; i < frames.size(); ++i) {
    for (size_t t = 0; t < thresholds.size(); ++t) {
      Stat st = compute_statistics(cls, frames[i], cleaned[i], true, metric,
                                   compute_aos, thresholds[t],
                                   ovl[i].data());
      agg[t].tp += st.tp;
      agg[t].fp += st.fp;
      agg[t].fn += st.fn;
      if (st.similarity != -1) agg[t].similarity += st.similarity;
    }
  }
  precision->assign(N_SAMPLE_PTS, 0.0);
  if (compute_aos) aos->assign(N_SAMPLE_PTS, 0.0);
  for (size_t i = 0; i < thresholds.size(); ++i) {
    double denom = agg[i].tp + agg[i].fp;
    (*precision)[i] = denom > 0 ? agg[i].tp / denom : 0.0;
    if (compute_aos) (*aos)[i] = denom > 0 ? agg[i].similarity / denom : 0.0;
  }
  for (size_t i = 0; i < thresholds.size(); ++i) {
    (*precision)[i] =
        *std::max_element(precision->begin() + i, precision->end());
    if (compute_aos)
      (*aos)[i] = *std::max_element(aos->begin() + i, aos->end());
  }
}

void save_rows(FILE *fp, const std::vector<double> &row) {
  for (double v : row) fprintf(fp, "%f ", v);
  fprintf(fp, "\n");
}

// Stdout + optional mail tee (behavioural spec: the reference Mail class,
// mail.h:8-46 — every msg() line goes to stdout verbatim AND, when an
// address is given, to a sendmail pipe with To/From/Subject headers).
// Offline fallback: no sendmail on the host -> the composed message is
// written to <result_dir>/notification.txt instead.
class Notifier {
 public:
  Notifier(const std::string &email, const std::string &result_dir) {
    if (email.empty()) return;
    if (access("/usr/lib/sendmail", X_OK) == 0) {
      sink_ = popen("/usr/lib/sendmail -t", "w");
      piped_ = sink_ != nullptr;
    }
    if (!sink_) {
      fallback_path_ = result_dir + "/notification.txt";
      sink_ = fopen(fallback_path_.c_str(), "w");
    }
    if (sink_) {
      fprintf(sink_, "To: %s\n", email.c_str());
      fprintf(sink_, "Subject: KITTI Evaluation Benchmark\n\n\n");
    } else {
      fprintf(stderr, "WARNING: cannot open a notification sink for %s\n",
              email.c_str());
    }
  }
  ~Notifier() {
    if (!sink_) return;
    if (piped_) {
      pclose(sink_);
    } else {
      fclose(sink_);
      printf("notification written to %s\n", fallback_path_.c_str());
    }
  }
  Notifier(const Notifier &) = delete;
  Notifier &operator=(const Notifier &) = delete;

  void msg(const char *format, ...) {
    va_list args;
    va_start(args, format);
    tee(stdout, format, args);
    va_end(args);
  }

  // errors keep their stderr stream (unlike the reference, which sends
  // everything to stdout) but still reach the mail sink
  void err(const char *format, ...) {
    va_list args;
    va_start(args, format);
    tee(stderr, format, args);
    va_end(args);
  }

 private:
  void tee(FILE *console, const char *format, va_list args) {
    if (sink_) {
      va_list copy;
      va_copy(copy, args);
      vfprintf(sink_, format, copy);
      fprintf(sink_, "\n");
      va_end(copy);
    }
    vfprintf(console, format, args);
    fprintf(console, "\n");
  }

  FILE *sink_ = nullptr;
  bool piped_ = false;
  std::string fallback_path_;
};

void report(const char *label, std::vector<double> curves[3],
            Notifier *notify) {
  double r40[3] = {0, 0, 0}, r11[3] = {0, 0, 0};
  for (int d = 0; d < 3; ++d) {
    for (size_t i = 1; i < curves[d].size(); ++i) r40[d] += curves[d][i];
    for (size_t i = 0; i < curves[d].size(); i += 4) r11[d] += curves[d][i];
  }
  notify->msg("%s AP: %f %f %f", label, r40[0] / 40 * 100,
              r40[1] / 40 * 100, r40[2] / 40 * 100);
  notify->msg("%s AP_R11: %f %f %f", label, r11[0] / 11 * 100,
              r11[1] / 11 * 100, r11[2] / 11 * 100);
}

}  // namespace

int main(int argc, char **argv) {
  bool server_mode = false;
  int n_testimages = N_TESTIMAGES;
  // binary-name dispatch: a copy/link named like the reference's server
  // evaluator runs in server mode
  {
    std::string prog(argv[0]);
    size_t slash = prog.find_last_of('/');
    std::string base = slash == std::string::npos ? prog
                                                  : prog.substr(slash + 1);
    if (base == "evaluate_object_3d") server_mode = true;
  }
  std::vector<std::string> pos_args;
  std::string email;
  for (int i = 1; i < argc; ++i) {
    std::string a(argv[i]);
    if (a.rfind("--email=", 0) == 0) {
      email = a.substr(8);
      if (email.empty()) {
        fprintf(stderr, "invalid %s: expected --email=<address>\n",
                a.c_str());
        return 1;
      }
    } else if (a.rfind("--server", 0) == 0) {
      server_mode = true;
      if (a.size() > 8) {
        // anything after "--server" must be "=<positive integer>"
        char *end = nullptr;
        errno = 0;
        long long n = a[8] == '=' ? strtoll(a.c_str() + 9, &end, 10) : 0;
        // bound the count BEFORE the narrowing cast: a value past INT_MAX
        // (or an ERANGE saturation) would otherwise truncate — possibly
        // to 0 or negative — and silently evaluate nothing
        if (a[8] != '=' || end == a.c_str() + 9 || *end != '\0' ||
            errno == ERANGE || n <= 0 || n > 10000000) {
          fprintf(stderr,
                  "invalid %s: expected --server=<N in 1..10000000>\n",
                  a.c_str());
          return 1;
        }
        n_testimages = static_cast<int>(n);
      }
    } else {
      pos_args.push_back(a);
    }
  }
  if (pos_args.size() != 2) {
    fprintf(stderr,
            "Usage: %s [--server[=N]] [--email=<addr>] <gt_dir> "
            "<result_dir>\n",
            argv[0]);
    return 1;
  }
  if (server_mode) MIN_OVERLAP = MIN_OVERLAP_SERVER;
  std::string gt_dir = pos_args[0];
  std::string result_dir = pos_args[1];
  std::string data_dir = result_dir + "/data";
  Notifier notify(email, result_dir);

  std::vector<std::string> names;
  if (server_mode) {
    // fixed test-split index range; every submission file must exist
    char buf[32];
    for (int i = 0; i < n_testimages; ++i) {
      snprintf(buf, sizeof(buf), "%06d.txt", i);
      std::string p = data_dir + "/" + buf;
      if (FILE *fp = fopen(p.c_str(), "r")) {
        fclose(fp);
      } else {
        notify.err("ERROR: server mode requires all %d files; missing %s",
                   n_testimages, p.c_str());
        return 1;
      }
      names.push_back(buf);
    }
  } else if (DIR *dir = opendir(data_dir.c_str())) {
    while (dirent *e = readdir(dir)) {
      std::string n(e->d_name);
      // only KITTI frame files ("######.txt"): a stray notes.txt in
      // data/ must not abort the evaluation looking for its ground truth
      // (the reference's getEvalIndices parses the 6-digit prefix)
      if (n.size() == 10 && n.substr(6) == ".txt" &&
          std::all_of(n.begin(), n.begin() + 6,
                      [](unsigned char ch) { return std::isdigit(ch); }))
        names.push_back(n);
    }
    closedir(dir);
  } else {
    notify.err("cannot open %s", data_dir.c_str());
    return 1;
  }
  std::sort(names.begin(), names.end());
  notify.msg("number of files for evaluation: %d",
             static_cast<int>(names.size()));

  bool compute_aos = true;
  bool eval_image_cls[N_CLASS] = {false, false, false};
  bool eval_ground_cls[N_CLASS] = {false, false, false};
  bool eval_3d_cls[N_CLASS] = {false, false, false};
  std::vector<Frame> frames;
  frames.reserve(names.size());
  for (const std::string &n : names) {
    Frame f;
    if (!load_file(gt_dir + "/" + n, false, &f.gt, nullptr)) {
      notify.err("ERROR: couldn't read ground truth %s", n.c_str());
      return 1;
    }
    if (!load_file(data_dir + "/" + n, true, &f.det, &compute_aos)) {
      notify.err("ERROR: couldn't read %s", n.c_str());
      return 1;
    }
    for (const Obj &d : f.det) {
      int c = class_index(d.type);
      if (c < 0) continue;
      if (d.x1 >= 0) eval_image_cls[c] = true;
      if (d.t1 != -1000) eval_ground_cls[c] = true;
      if (d.t2 != -1000) eval_3d_cls[c] = true;
    }
    frames.push_back(std::move(f));
  }

  struct Task {
    Metric metric;
    const char *suffix;
    bool *flags;
  };
  Task tasks[3] = {{IMAGE, "detection", eval_image_cls},
                   {GROUND, "detection_ground", eval_ground_cls},
                   {BOX3D, "detection_3d", eval_3d_cls}};

  for (const Task &task : tasks) {
    bool any = task.flags[0] || task.flags[1] || task.flags[2];
    if (!any) continue;
    // per-frame det x gt overlap matrix, computed ONCE per metric and
    // reused across every class/difficulty/threshold pass
    std::vector<std::vector<double>> ovl(frames.size());
    for (size_t i = 0; i < frames.size(); ++i) {
      const Frame &f = frames[i];
      ovl[i].resize(f.det.size() * f.gt.size());
      for (size_t j = 0; j < f.det.size(); ++j)
        for (size_t g = 0; g < f.gt.size(); ++g)
          ovl[i][j * f.gt.size() + g] =
              overlap(task.metric, f.det[j], f.gt[g], -1);
    }
    for (int c = 0; c < N_CLASS; ++c) {
      if (!task.flags[c]) continue;
      bool with_aos = compute_aos && task.metric == IMAGE;
      std::vector<double> precision[3], aos[3];
      for (int d = 0; d < 3; ++d)
        eval_class(frames, c, d, task.metric, with_aos, &precision[d],
                   &aos[d], ovl);
      std::string stats = result_dir + "/stats_" + CLASS_NAMES[c] + "_" +
                          task.suffix + ".txt";
      if (FILE *fp = fopen(stats.c_str(), "w")) {
        for (int d = 0; d < 3; ++d) save_rows(fp, precision[d]);
        fclose(fp);
      } else {
        fprintf(stderr, "WARNING: cannot write %s\n", stats.c_str());
      }
      std::string label = std::string(CLASS_NAMES[c]) + "_" + task.suffix;
      report(label.c_str(), precision, &notify);
      if (with_aos) {
        std::string ostats =
            result_dir + "/stats_" + CLASS_NAMES[c] + "_orientation.txt";
        if (FILE *fp = fopen(ostats.c_str(), "w")) {
          for (int d = 0; d < 3; ++d) save_rows(fp, aos[d]);
          fclose(fp);
        } else {
          fprintf(stderr, "WARNING: cannot write %s\n", ostats.c_str());
        }
        std::string olabel = std::string(CLASS_NAMES[c]) + "_orientation";
        report(olabel.c_str(), aos, &notify);
      }
    }
  }
  return 0;
}
