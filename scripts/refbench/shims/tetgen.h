// tetgen stub: declares just enough of the tetgenio / tetgenbehavior /
// tetrahedralize() surface for PrimitiveUtilities.cpp to compile.  The
// baseline harness never calls addTriMeshVolume, so tetrahedralize aborts.
#pragma once

#include <cstdio>
#include <cstdlib>

class tetgenio {
 public:
  struct polygon {
    int* vertexlist = nullptr;
    int numberofvertices = 0;
  };
  struct facet {
    polygon* polygonlist = nullptr;
    int numberofpolygons = 0;
    double* holelist = nullptr;
    int numberofholes = 0;
  };

  double* pointlist = nullptr;
  int numberofpoints = 0;
  facet* facetlist = nullptr;
  int numberoffacets = 0;
  int* tetrahedronlist = nullptr;
  int numberoftetrahedra = 0;
  int* trifacelist = nullptr;
  int numberoftrifaces = 0;
  int* face2tetlist = nullptr;
};

class tetgenbehavior {
 public:
  int plc = 0;
  int facesout = 0;
  int neighout = 0;
  int zeroindex = 0;
  int quality = 0;
  double minratio = 2.0;
  int regionattrib = 0;
  int cdt = 0;
  int refine = 0;
  int varvolume = 0;
  double maxvolume = -1.0;
  int nomergefacet = 0;
  int nofacewritten = 0;
};

inline void tetrahedralize(tetgenbehavior*, tetgenio*, tetgenio*) {
  std::fprintf(stderr, "tetgen stub: tetrahedralize() not available in the baseline harness\n");
  std::abort();
}
