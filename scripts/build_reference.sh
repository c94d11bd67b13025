#!/bin/bash
# Rebuild the reference SU2 fork binary for parity fixtures (round-5
# recipe; see BASELINE.md).  The fork's reactive translation units
# miscompile at -O1/-O2 (NaN at the first viscous residual), so the four
# fork objects are rebuilt at -O0 after the -O2 build; the reacting model
# library needs <array> included and std::experimental::filesystem needs
# -lstdc++fs on gcc 12.
set -e
SRC=${1:-/tmp/su2ref}
rm -rf "$SRC"
cp -r /root/reference "$SRC"
cd "$SRC"
chmod -R u+w .
# missing include (vector<array<double,2>> member, gcc12 rejects)
sed -i 's|#include <tuple>|#include <tuple>\n#include <array>|' \
    Common/include/Framework/reacting_model_library.hpp
# keep autotools from regenerating (no autoconf in the image)
find . -name aclocal.m4 -exec touch {} +; find . -name "*.m4" -exec touch {} +
sleep 1; find . -name configure -exec touch {} +
sleep 1; find . -name Makefile.in -exec touch {} +
chmod +x configure
bash configure --prefix="$SRC/install" CXXFLAGS="-O2 -std=c++11"
make -j 8 LIBS="-lstdc++fs" || true
# fork files only run correctly at -O0
find . -name "*direct_reactive*.o" -o -name "*reacting_model_library*.o" \
    | xargs rm -f
make -j 8 CXXFLAGS="-O0 -std=c++11" LIBS="-lstdc++fs"
make install LIBS="-lstdc++fs"
echo "binary: $SRC/install/bin/SU2_CFD"
# sanity: iteration-0 no-chem residuals must print -3.022432 / 2.359877
