// Minimal driver for golden-diff testing against the reference engine.
//
// The upstream FARMS_Flow main.cpp uses Boost.program_options, which is not
// installed in this environment; this tiny replacement parses positional
// arguments instead and calls the same vFlowManager::runFileCopy entry
// point (reference: src/main.cpp:186-198 does exactly this after flag
// parsing). This file is original code owned by this repo; only the
// vFlow/Event/FlowEvent translation units come from the read-only
// reference checkout at build time (see tests/test_reference_binary.py).
//
// Usage: farms_ref <fileNameNoExt> <height> <width> <filterSize>
//                  <minEvtsOnPlane> [numEvents]
#include <cstdlib>
#include <iostream>
#include <string>

#include "vFlow.h"

int main(int argc, char** argv) {
  if (argc < 6) {
    std::cerr << "usage: " << argv[0]
              << " <fileNameNoExt> <height> <width> <filterSize>"
                 " <minEvtsOnPlane> [numEvents]\n";
    return 2;
  }
  std::string fileName = argv[1];
  int height = std::atoi(argv[2]);
  int width = std::atoi(argv[3]);
  int filterSize = std::atoi(argv[4]);
  int minEvtsOnPlane = std::atoi(argv[5]);
  unsigned long int numEvents = (argc > 6)
      ? std::strtoul(argv[6], nullptr, 10)
      : ~0UL;

  vFlowManager manager(height, width, filterSize, minEvtsOnPlane, fileName);
  long usec = manager.runFileCopy(numEvents);
  std::cout << "[ref harness] done in " << usec << " usec" << std::endl;
  return 0;
}
