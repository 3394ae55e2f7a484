// Shim: the c-array append overload lives in <boost/geometry.hpp>.
#ifndef BOOST_GEOMETRY_C_ARRAY_SHIM_HPP
#define BOOST_GEOMETRY_C_ARRAY_SHIM_HPP
#include <boost/geometry.hpp>
#endif
