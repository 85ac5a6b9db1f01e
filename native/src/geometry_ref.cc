// Native host reference implementations for bit-level validation of the
// device (JAX) geometry kernels — the C++ counterpart the build mandates
// for the reference's native components (SURVEY.md section 2.4):
//   * Gauss-Newton / Levenberg-Marquardt PnP with optional per-axis weights
//     and Huber robustification (Ceres CreatePnPCostFunction equivalent,
//     R2/utils/speed_eval.py:269-319);
//   * Jonker-Volgenant shortest-augmenting-path LSAP (scipy
//     linear_sum_assignment equivalent, R1/models/matcher.py:82).
//
// Exposed with C linkage and driven from Python via ctypes (no pybind11 in
// the image). Built by native/build.sh into libgeometry_ref.so.

#include <cmath>
#include <cstring>
#include <limits>
#include <vector>

namespace {

// --- minimal fixed-size linear algebra ------------------------------------

void rodrigues(const double r[3], double R[9]) {
  const double theta2 = r[0] * r[0] + r[1] * r[1] + r[2] * r[2];
  const double theta = std::sqrt(theta2);
  double a, b;
  if (theta2 < 1e-12) {
    a = 1.0 - theta2 / 6.0;
    b = 0.5 - theta2 / 24.0;
  } else {
    a = std::sin(theta) / theta;
    b = (1.0 - std::cos(theta)) / theta2;
  }
  const double K[9] = {0, -r[2], r[1], r[2], 0, -r[0], -r[1], r[0], 0};
  double K2[9];
  for (int i = 0; i < 3; ++i)
    for (int j = 0; j < 3; ++j) {
      double s = 0;
      for (int k = 0; k < 3; ++k) s += K[i * 3 + k] * K[k * 3 + j];
      K2[i * 3 + j] = s;
    }
  for (int i = 0; i < 9; ++i)
    R[i] = (i % 4 == 0 ? 1.0 : 0.0) + a * K[i] + b * K2[i];
}

// Solve 6x6 A x = b by Gaussian elimination with partial pivoting.
bool solve6(double A[36], double b[6], double x[6]) {
  int piv[6];
  for (int i = 0; i < 6; ++i) piv[i] = i;
  for (int col = 0; col < 6; ++col) {
    int best = col;
    for (int r = col + 1; r < 6; ++r)
      if (std::fabs(A[r * 6 + col]) > std::fabs(A[best * 6 + col])) best = r;
    if (std::fabs(A[best * 6 + col]) < 1e-14) return false;
    if (best != col) {
      for (int c = 0; c < 6; ++c) std::swap(A[col * 6 + c], A[best * 6 + c]);
      std::swap(b[col], b[best]);
    }
    for (int r = col + 1; r < 6; ++r) {
      const double f = A[r * 6 + col] / A[col * 6 + col];
      for (int c = col; c < 6; ++c) A[r * 6 + c] -= f * A[col * 6 + c];
      b[r] -= f * b[col];
    }
  }
  for (int r = 5; r >= 0; --r) {
    double s = b[r];
    for (int c = r + 1; c < 6; ++c) s -= A[r * 6 + c] * x[c];
    x[r] = s / A[r * 6 + r];
  }
  return true;
}

// Axis-angle from rotation matrix via quaternion (Shepperd).
void inverse_rodrigues(const double R[9], double r[3]) {
  const double tr = R[0] + R[4] + R[8];
  double q[4];  // w x y z
  if (tr > 0) {
    double s = std::sqrt(tr + 1.0) * 2;
    q[0] = 0.25 * s;
    q[1] = (R[7] - R[5]) / s;
    q[2] = (R[2] - R[6]) / s;
    q[3] = (R[3] - R[1]) / s;
  } else if (R[0] > R[4] && R[0] > R[8]) {
    double s = std::sqrt(1.0 + R[0] - R[4] - R[8]) * 2;
    q[0] = (R[7] - R[5]) / s;
    q[1] = 0.25 * s;
    q[2] = (R[1] + R[3]) / s;
    q[3] = (R[2] + R[6]) / s;
  } else if (R[4] > R[8]) {
    double s = std::sqrt(1.0 + R[4] - R[0] - R[8]) * 2;
    q[0] = (R[2] - R[6]) / s;
    q[1] = (R[1] + R[3]) / s;
    q[2] = 0.25 * s;
    q[3] = (R[5] + R[7]) / s;
  } else {
    double s = std::sqrt(1.0 + R[8] - R[0] - R[4]) * 2;
    q[0] = (R[3] - R[1]) / s;
    q[1] = (R[2] + R[6]) / s;
    q[2] = (R[5] + R[7]) / s;
    q[3] = 0.25 * s;
  }
  double n = std::sqrt(q[0] * q[0] + q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
  for (double& v : q) v /= n;
  if (q[0] < 0)
    for (double& v : q) v = -v;
  const double vnorm = std::sqrt(q[1] * q[1] + q[2] * q[2] + q[3] * q[3]);
  const double theta = 2.0 * std::atan2(vnorm, q[0]);
  const double scale = vnorm < 1e-9 ? 2.0 : theta / vnorm;
  r[0] = q[1] * scale;
  r[1] = q[2] * scale;
  r[2] = q[3] * scale;
}

}  // namespace

extern "C" {

// Weighted Huber LM PnP on normalized camera coordinates.
//   world: n*3, obs_norm: n*2 (pre-normalized), weights: n*2 (pass 1s for
//   unweighted), mask: n, rt: in/out [rvec(3), tvec(3)].
// Residual per point: w * (project(R p + t) - obs); Huber on the 2-vector
// block with delta (<=0 disables). Returns final cost.
double gn_pnp_refine(const double* world, const double* obs_norm,
                     const double* weights, const unsigned char* mask, int n,
                     double huber_delta, int iters, double* rt) {
  double R[9];
  rodrigues(rt, R);
  double t[3] = {rt[3], rt[4], rt[5]};
  double lambda = 1e-3;

  auto cost_of = [&](const double Rc[9], const double tc[3]) {
    double cost = 0;
    for (int i = 0; i < n; ++i) {
      if (!mask[i]) continue;
      const double* p = world + i * 3;
      double pc[3];
      for (int k = 0; k < 3; ++k)
        pc[k] = Rc[k * 3] * p[0] + Rc[k * 3 + 1] * p[1] + Rc[k * 3 + 2] * p[2] +
                tc[k];
      const double z = std::fabs(pc[2]) < 1e-9 ? 1e-9 : pc[2];
      double rx = weights[i * 2] * (pc[0] / z - obs_norm[i * 2]);
      double ry = weights[i * 2 + 1] * (pc[1] / z - obs_norm[i * 2 + 1]);
      double s = rx * rx + ry * ry;
      if (huber_delta > 0 && s > huber_delta * huber_delta)
        s = huber_delta * huber_delta * (2.0 * std::sqrt(s) / huber_delta - 1.0)
            ;  // rho(s) = 2 delta sqrt(s) - delta^2  (continuation of s)
      cost += s;
    }
    return cost;
  };

  for (int it = 0; it < iters; ++it) {
    double JtJ[36] = {0};
    double Jtr[6] = {0};
    for (int i = 0; i < n; ++i) {
      if (!mask[i]) continue;
      const double* p = world + i * 3;
      double pc[3];
      for (int k = 0; k < 3; ++k)
        pc[k] = R[k * 3] * p[0] + R[k * 3 + 1] * p[1] + R[k * 3 + 2] * p[2] +
                t[k];
      const double z = std::fabs(pc[2]) < 1e-9 ? 1e-9 : pc[2];
      const double inv_z = 1.0 / z;
      double res[2] = {
          weights[i * 2] * (pc[0] * inv_z - obs_norm[i * 2]),
          weights[i * 2 + 1] * (pc[1] * inv_z - obs_norm[i * 2 + 1])};

      // d(proj)/d(pc)
      double Jp[6] = {inv_z, 0, -pc[0] * inv_z * inv_z,
                      0, inv_z, -pc[1] * inv_z * inv_z};
      // d(pc)/d(dw) = -[pc - t]x, d(pc)/dt = I
      const double rp[3] = {pc[0] - t[0], pc[1] - t[1], pc[2] - t[2]};
      double Jrow[2][6];
      for (int r = 0; r < 2; ++r) {
        const double* g = Jp + r * 3;  // gradient wrt pc
        // rotation block: g . (-[rp]x)
        Jrow[r][0] = g[2] * rp[1] - g[1] * rp[2];
        Jrow[r][1] = g[0] * rp[2] - g[2] * rp[0];
        Jrow[r][2] = g[1] * rp[0] - g[0] * rp[1];
        Jrow[r][3] = g[0];
        Jrow[r][4] = g[1];
        Jrow[r][5] = g[2];
        const double w = weights[i * 2 + r];
        for (int c = 0; c < 6; ++c) Jrow[r][c] *= w;
      }
      double hw = 1.0;
      if (huber_delta > 0) {
        const double s = res[0] * res[0] + res[1] * res[1];
        if (s > huber_delta * huber_delta)
          hw = std::sqrt(huber_delta / std::sqrt(s));
      }
      for (int r = 0; r < 2; ++r) {
        const double rr = res[r] * hw;
        for (int c = 0; c < 6; ++c) {
          Jtr[c] += Jrow[r][c] * hw * rr;
          for (int c2 = 0; c2 < 6; ++c2)
            JtJ[c * 6 + c2] += Jrow[r][c] * hw * Jrow[r][c2] * hw;
        }
      }
    }
    double A[36];
    std::memcpy(A, JtJ, sizeof(A));
    for (int d = 0; d < 6; ++d)
      A[d * 6 + d] += lambda * JtJ[d * 6 + d] + 1e-12;
    double b[6], dx[6];
    for (int d = 0; d < 6; ++d) b[d] = -Jtr[d];
    if (!solve6(A, b, dx)) break;

    double dR[9], Rn[9];
    rodrigues(dx, dR);
    for (int i = 0; i < 3; ++i)
      for (int j = 0; j < 3; ++j) {
        double s = 0;
        for (int k = 0; k < 3; ++k) s += dR[i * 3 + k] * R[k * 3 + j];
        Rn[i * 3 + j] = s;
      }
    double tn[3] = {t[0] + dx[3], t[1] + dx[4], t[2] + dx[5]};
    if (cost_of(Rn, tn) < cost_of(R, t)) {
      std::memcpy(R, Rn, sizeof(R));
      std::memcpy(t, tn, sizeof(t));
      lambda = std::max(lambda * 0.5, 1e-9);
    } else {
      lambda = std::min(lambda * 4.0, 1e6);
    }
  }

  inverse_rodrigues(R, rt);
  rt[3] = t[0];
  rt[4] = t[1];
  rt[5] = t[2];
  return cost_of(R, t);
}

// Exact LSAP (shortest augmenting path with duals). cost is rows x cols
// row-major with rows <= cols; writes col4row[rows]. Returns total cost.
double lsap(const double* cost, int rows, int cols, int* col4row) {
  const double INF = std::numeric_limits<double>::infinity();
  std::vector<double> u(rows, 0), v(cols, 0);
  std::vector<int> row4col(cols, -1);
  std::vector<int> c4r(rows, -1);

  for (int cur = 0; cur < rows; ++cur) {
    std::vector<double> shortest(cols, INF);
    std::vector<int> path(cols, -1);
    std::vector<char> SR(rows, 0), SC(cols, 0);
    int i = cur, sink = -1;
    double min_val = 0;
    while (sink == -1) {
      SR[i] = 1;
      for (int j = 0; j < cols; ++j) {
        if (SC[j]) continue;
        const double r = min_val + cost[i * cols + j] - u[i] - v[j];
        if (r < shortest[j]) {
          shortest[j] = r;
          path[j] = i;
        }
      }
      int jmin = -1;
      double best = INF;
      for (int j = 0; j < cols; ++j)
        if (!SC[j] && shortest[j] < best) {
          best = shortest[j];
          jmin = j;
        }
      if (jmin < 0) return INF;  // infeasible (all costs INF)
      min_val = best;
      SC[jmin] = 1;
      if (row4col[jmin] == -1)
        sink = jmin;
      else
        i = row4col[jmin];
    }
    u[cur] += min_val;
    for (int r = 0; r < rows; ++r)
      if (SR[r] && r != cur) u[r] += min_val - shortest[c4r[r]];
    for (int j = 0; j < cols; ++j)
      if (SC[j]) v[j] -= min_val - shortest[j];
    int j = sink;
    while (true) {
      const int r = path[j];
      row4col[j] = r;
      std::swap(c4r[r], j);
      if (r == cur) break;
    }
  }
  double total = 0;
  for (int r = 0; r < rows; ++r) {
    col4row[r] = c4r[r];
    total += cost[r * cols + c4r[r]];
  }
  return total;
}

}  // extern "C"
