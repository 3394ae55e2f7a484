// Shim: the reference includes this for operator<< it never uses.
#ifndef BOOST_UBLAS_IO_SHIM_HPP
#define BOOST_UBLAS_IO_SHIM_HPP
#endif
