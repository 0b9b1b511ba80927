// Minimal boost::math chi-squared shim: cdf via the regularized lower
// incomplete gamma P(k/2, x/2); quantile via bisection on the cdf.
#pragma once
#include <cmath>
#include <limits>

namespace boost {
namespace math {

namespace detail {
// regularized lower incomplete gamma P(a, x): series for x < a+1,
// continued fraction otherwise (Numerical Recipes construction).
inline double gamma_p(double a, double x) {
  if (x <= 0.0) return 0.0;
  const double gln = std::lgamma(a);
  if (x < a + 1.0) {
    double ap = a, sum = 1.0 / a, del = sum;
    for (int i = 0; i < 500; ++i) {
      ap += 1.0;
      del *= x / ap;
      sum += del;
      if (std::fabs(del) < std::fabs(sum) * 1e-15) break;
    }
    return sum * std::exp(-x + a * std::log(x) - gln);
  }
  double b = x + 1.0 - a, c = 1e300, d = 1.0 / b, h = d;
  for (int i = 1; i <= 500; ++i) {
    double an = -double(i) * (double(i) - a);
    b += 2.0;
    d = an * d + b;
    if (std::fabs(d) < 1e-300) d = 1e-300;
    c = b + an / c;
    if (std::fabs(c) < 1e-300) c = 1e-300;
    d = 1.0 / d;
    double del = d * c;
    h *= del;
    if (std::fabs(del - 1.0) < 1e-15) break;
  }
  return 1.0 - std::exp(-x + a * std::log(x) - gln) * h;
}
}  // namespace detail

template <class T>
class chi_squared_distribution {
 public:
  explicit chi_squared_distribution(T df) : df_(df) {}
  T degrees_of_freedom() const { return df_; }

 private:
  T df_;
};
typedef chi_squared_distribution<double> chi_squared;

template <class T, class U>
inline T cdf(const chi_squared_distribution<T>& d, U x) {
  if (x <= 0) return T(0);
  return T(detail::gamma_p(double(d.degrees_of_freedom()) / 2.0,
                           double(x) / 2.0));
}

template <class T, class U>
inline T quantile(const chi_squared_distribution<T>& d, U p) {
  if (p <= 0) return T(0);
  if (p >= 1) return std::numeric_limits<T>::infinity();
  double lo = 0.0, hi = 1.0;
  while (cdf(d, T(hi)) < double(p) && hi < 1e8) hi *= 2.0;
  for (int i = 0; i < 200; ++i) {
    double mid = 0.5 * (lo + hi);
    if (cdf(d, T(mid)) < double(p))
      lo = mid;
    else
      hi = mid;
  }
  return T(0.5 * (lo + hi));
}

}  // namespace math
}  // namespace boost
