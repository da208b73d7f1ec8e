// Headless benchmark driver for the REFERENCE C++ solver.
//
// Compiles the unmodified sources under /root/reference (parse ->
// triangulate -> N x Solver::step(), exactly the pipeline of
// executables/bearing_only_slam.cpp minus the OpenCV window/keyboard loop)
// and times the steps.  This produces the true CPU baseline number for
// BENCH comparisons; no reference code lives in this repo — see the
// Makefile, which points the compiler at /root/reference.

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <fstream>
#include <set>
#include <sstream>
#include <string>
#include <vector>

#include "framework/state.hpp"
#include "framework/observation.hpp"
#include "slam/solver.hpp"
#include "slam/triangulation.hpp"
#include "utils/g2o_utils.hpp"

using namespace proj02;
using clk = std::chrono::steady_clock;

int main(int argc, char** argv) {
    if (argc < 2) {
        std::fprintf(stderr, "usage: %s <g2o file> [iters]\n", argv[0]);
        return 1;
    }
    int iters = argc > 2 ? std::atoi(argv[2]) : 50;

    State state;
    BearingObservationVector bearings;
    OdometryObservationVector odometries;
    int fixed_pose_id;
    float bound;

    auto t0 = clk::now();
    parse_g2o(argv[1], state, bearings, odometries, fixed_pose_id, bound);
    if (fixed_pose_id == -1) fixed_pose_id = state.default_pose_id();
    auto t1 = clk::now();

    triangulate_landmarks(state, bearings);
    auto t2 = clk::now();

    Solver solver(state, bearings, odometries, fixed_pose_id);
    // warm-up step so the sparsity-pattern analysis (analyzePattern,
    // solver.cpp:77-80) is excluded from the timed region, mirroring how
    // the JAX bench excludes compilation.
    solver.step();
    auto t3 = clk::now();
    for (int i = 0; i < iters; i++) {
        solver.step();
    }
    auto t4 = clk::now();

    double parse_s = std::chrono::duration<double>(t1 - t0).count();
    double tri_s = std::chrono::duration<double>(t2 - t1).count();
    double warm_s = std::chrono::duration<double>(t3 - t2).count();
    double steps_s = std::chrono::duration<double>(t4 - t3).count();

    // chi2 of the converged state (computed here — the reference itself
    // never computes chi2 anywhere), with the same threshold-kernel clamp
    // our chi2_robust metric uses.
    double chi2 = 0.0;
    for (const BearingObservation& obs : solver.bearing_observations) {
        float pred = solver.predict_bearing(
            solver.state.get_pose_by_id(obs.get_pose_id()),
            solver.state.get_landmark_by_id(obs.get_lm_id()));
        float err = solver.normalized_angle(pred - obs.get_bearing().smallestAngle());
        double c = (double)err * obs.get_omega() * err;
        chi2 += c < 1.0 ? c : 1.0;
    }
    for (const OdometryObservation& obs : solver.odometry_observations) {
        EPose pred = solver.predict_odometry(
            solver.state.get_pose_by_id(obs.get_source_id()),
            solver.state.get_pose_by_id(obs.get_dest_id()));
        EPose err = pred - obs.get_transformation();
        err.z() = solver.normalized_angle(err.z());
        double c = err.transpose() * obs.get_omega() * err;
        chi2 += c < 1.0 ? c : 1.0;
    }

    std::printf(
        "{\"parse_s\": %.6f, \"triangulate_s\": %.6f, \"first_step_s\": %.6f, "
        "\"steps\": %d, \"steps_total_s\": %.6f, \"iters_per_s\": %.3f, "
        "\"chi2_robust\": %.6f}\n",
        parse_s, tri_s, warm_s, iters, steps_s, iters / steps_s, chi2);

    // Optional: dump the converged state for cross-implementation parity
    // checks (VERTEX_SE2/VERTEX_XY records, original ids).
    if (argc > 3) {
        FILE* f = std::fopen(argv[3], "w");
        // walk ids through the public state using the same parse result
        State probe;
        BearingObservationVector b2;
        OdometryObservationVector o2;
        int fid2; float bnd2;
        parse_g2o(argv[1], probe, b2, o2, fid2, bnd2);
        // pose ids: re-parse order == state order; emit via id lookups
        std::vector<int> pose_ids, lm_ids;
        {
            // recover ids by scanning the file again (cheap, host-side)
            std::ifstream fin(argv[1]);
            std::string line, tag;
            while (std::getline(fin, line)) {
                std::istringstream ls(line);
                ls >> tag;
                if (tag == "VERTEX_SE2") { int id; ls >> id; pose_ids.push_back(id); }
            }
        }
        for (int id : pose_ids) {
            EPose p = t2v(solver.state.get_pose_by_id(id));
            std::fprintf(f, "VERTEX_SE2 %d %.9g %.9g %.9g\n", id, p.x(), p.y(), p.z());
        }
        // landmark ids = sorted unique bearing lm ids (triangulation order)
        std::set<int> lm_set;
        for (const BearingObservation& obs : bearings) lm_set.insert(obs.get_lm_id());
        for (int id : lm_set) {
            LMPos l = solver.state.get_landmark_by_id(id);
            std::fprintf(f, "VERTEX_XY %d %.9g %.9g\n", id, l.x(), l.y());
        }
        std::fclose(f);
    }
    return 0;
}
