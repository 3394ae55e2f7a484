// Shim: types live in <boost/geometry.hpp> (see that header's note).
#ifndef BOOST_GEOMETRY_POLYGON_SHIM_HPP
#define BOOST_GEOMETRY_POLYGON_SHIM_HPP
#include <boost/geometry.hpp>
#endif
