#pragma once
#include <boost/math/distributions/chi_squared.hpp>
