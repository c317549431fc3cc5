// Headless parity oracle for the reference renderer.
//
// Links the reference's render core (/root/reference: core/, shape/,
// accelerator/, materials/, lights/, integrators/, samplers/, camera/)
// unmodified, replacing only the Qt FrameBuffer with a linear stub
// (stub/ui/FrameBuffer.h).  The scene below is the reference's own
// hardcoded Cornell scene (ui/RenderThread.cpp:46-187 +
// ui/ModelList.cpp:71-147), parameterized just enough to drive the
// BASELINE parity configs.  Output: raw float32 RGB linear radiance +
// one JSON line of metadata on stdout.
//
// Usage:
//   oracle OUT.raw WIDTH HEIGHT SPP INTEGRATOR MAXDEPTH SIGMA STRATEGY SKYBOX
//     INTEGRATOR: path | whitted | direct
//     SIGMA:      Matte roughness sigma (reference default 60)
//     STRATEGY:   uniform | power | spatial   (path only)
//     SKYBOX:     0 | 1  include the (broken-load) SkyBoxLight

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <memory>
#include <string>
#include <vector>

#include "core/GNXRayTracer.h"
#include "core/Geometry.h"
#include "core/Transform.h"
#include "core/Spectrum.h"
#include "core/Scene.h"
#include "core/Primitive.h"
#include "core/Integrator.h"
#include "core/Texture.h"
#include "accelerator/BVHAccel.h"
#include "camera/Perspective.h"
#include "samplers/HaltonSampler.h"
#include "shape/Triangle.h"
#include "materials/MatteMaterial.h"
#include "materials/MirrorMaterial.h"
#include "textures/ConstantTexture.h"
#include "lights/DiffuseAreaLight.h"
#include "lights/SkyBoxLight.h"
#include "integrators/PathIntegrator.h"
#include "integrators/WhittedIntegrator.h"
#include "integrators/DirectLightingIntegrator.h"
#include "ui/FrameBuffer.h"

using namespace pbr;

// The reference leaks an unconditional debug printf per unoccluded shadow
// ray (core/Integrator.cpp:143) — hot-loop I/O that would both flood
// stdout and distort the timing baseline.  Interpose printf at link time
// (this object resolves before libc) as a no-op; all oracle output goes
// through fprintf(stderr)/fwrite instead.
extern "C" int printf(const char *, ...) { return 0; }

static std::shared_ptr<Material> matte(float r, float g, float b, float sigmaV) {
    Spectrum c; c[0] = r; c[1] = g; c[2] = b;
    auto kd = std::make_shared<ConstantTexture<Spectrum>>(c);
    auto sigma = std::make_shared<ConstantTexture<Float>>(sigmaV);
    auto bump = std::make_shared<ConstantTexture<Float>>(0.0f);
    return std::make_shared<MatteMaterial>(kd, sigma, bump);
}

// Cornell walls: ui/ModelList.cpp:71-119 (verbatim coordinates).
static void addCornell(std::vector<std::shared_ptr<Primitive>> &prims,
                       std::shared_ptr<Material> m1,  // red (tris 6,7)
                       std::shared_ptr<Material> m2,  // blue (tris 8,9)
                       std::shared_ptr<Material> m3) {
    const int nTris = 10;
    static int idx[nTris * 3];
    for (int i = 0; i < nTris * 3; i++) idx[i] = i;
    const float L = 5.0f;
    static Point3f P[nTris * 3] = {
        {0, 0, L}, {L, 0, L}, {0, 0, 0},
        {L, 0, L}, {L, 0, 0}, {0, 0, 0},
        {0, L, L}, {0, L, 0}, {L, L, L},
        {L, L, L}, {0, L, 0}, {L, L, 0},
        {0, 0, 0}, {L, 0, 0}, {L, L, 0},
        {0, 0, 0}, {L, L, 0}, {0, L, 0},
        {0, 0, 0}, {0, L, L}, {0, 0, L},
        {0, 0, 0}, {0, L, 0}, {0, L, L},
        {L, 0, 0}, {L, L, L}, {L, 0, L},
        {L, 0, 0}, {L, L, 0}, {L, L, L},
    };
    static Transform o2w = Translate(Vector3f(-0.5f * L, -0.5f * L, -0.5f * L));
    static Transform w2o = Inverse(o2w);
    auto mesh = std::make_shared<TriangleMesh>(o2w, nTris, idx, nTris * 3, P,
                                               nullptr, nullptr, nullptr, nullptr);
    for (int i = 0; i < nTris; ++i) {
        auto tri = std::make_shared<Triangle>(&o2w, &w2o, false, mesh, i);
        auto m = (i == 6 || i == 7) ? m1 : (i == 8 || i == 9) ? m2 : m3;
        prims.push_back(std::make_shared<GeometricPrimitive>(tri, m, nullptr,
                                                             MediumInterface()));
    }
}

// Area light: ui/ModelList.cpp:121-147 (verbatim).
static void addAreaLight(std::vector<std::shared_ptr<Primitive>> &prims,
                         std::vector<std::shared_ptr<Light>> &lights,
                         std::shared_ptr<Material> mat) {
    static int idx[6] = {0, 1, 2, 3, 4, 5};
    static Point3f P[6] = {
        {-1.4f, 0.f, 1.4f}, {-1.4f, 0.f, -1.4f}, {1.4f, 0.f, 1.4f},
        {1.4f, 0.f, 1.4f},  {-1.4f, 0.f, -1.4f}, {1.4f, 0.f, -1.4f}};
    static Transform o2w = Translate(Vector3f(0.f, 2.45f, 0.f));
    static Transform w2o = Inverse(o2w);
    auto mesh = std::make_shared<TriangleMesh>(o2w, 2, idx, 6, P, nullptr,
                                               nullptr, nullptr, nullptr);
    for (int i = 0; i < 2; ++i) {
        auto tri = std::make_shared<Triangle>(&o2w, &w2o, false, mesh, i);
        auto area = std::make_shared<DiffuseAreaLight>(o2w, MediumInterface(),
                                                       Spectrum(5.0f), 5, tri, false);
        lights.push_back(area);
        prims.push_back(std::make_shared<GeometricPrimitive>(tri, mat, area,
                                                             MediumInterface()));
    }
}

int main(int argc, char **argv) {
    if (argc < 10) {
        fprintf(stderr, "usage: %s OUT.raw W H SPP path|whitted|direct "
                        "MAXDEPTH SIGMA STRATEGY SKYBOX\n", argv[0]);
        return 2;
    }
    const std::string out = argv[1];
    const int W = atoi(argv[2]), H = atoi(argv[3]), spp = atoi(argv[4]);
    const std::string integ = argv[5];
    const int maxDepth = atoi(argv[6]);
    const float sigma = (float)atof(argv[7]);
    const std::string strategy = argv[8];
    const int skybox = atoi(argv[9]);

    ClockRandomInit();

    FrameBuffer fb;
    fb.InitBuffer(W, H, 4);

    // Camera: ui/RenderThread.cpp:58-68
    Vector3f up(0.f, 1.f, 0.f);
    Point3f eye(0.f, 0.f, 5.f), look(0.f, 0.f, 0.f);
    Transform lookat = LookAt(eye, look, up);
    Transform c2w0 = Inverse(lookat), c2w1 = c2w0;
    AnimatedTransform animatedTrans(&c2w0, 0.f, &c2w1, 1.f);
    std::shared_ptr<const Camera> camera(
        CreatePerspectiveCamera(W, H, animatedTrans));

    // Materials: ui/RenderThread.cpp:78-103
    auto white = matte(0.91f, 0.91f, 0.91f, sigma);
    auto red = matte(0.9f, 0.1f, 0.17f, sigma);
    auto blue = matte(0.14f, 0.21f, 0.87f, sigma);
    auto dragon = matte(0.2f, 0.8f, 0.2f, sigma);

    std::vector<std::shared_ptr<Primitive>> prims;
    std::vector<std::shared_ptr<Light>> lights;
    addCornell(prims, red, blue, white);
    addAreaLight(prims, lights, dragon);
    if (skybox) {
        Transform skyToWorld;
        Point3f center(0.f, 0.f, 0.f);
        lights.push_back(std::make_shared<SkyBoxLight>(skyToWorld, center,
                                                       10.0f, "1", 1));
    }

    Scene scene(std::make_shared<BVHAccel>(prims, 1), lights);

    Bounds2i bounds(Point2i(0, 0), Point2i(W, H));
    auto sampler = std::make_shared<HaltonSampler>(spp, bounds, false);

    std::shared_ptr<Integrator> integrator;
    if (integ == "path")
        integrator = std::make_shared<PathIntegrator>(maxDepth, camera, sampler,
                                                      bounds, &fb, 1.f, strategy);
    else if (integ == "whitted")
        integrator = std::make_shared<WhittedIntegrator>(maxDepth, camera,
                                                         sampler, bounds, &fb);
    else
        integrator = std::make_shared<DirectLightingIntegrator>(
            LightStrategy::UniformSampleOne, maxDepth, camera, sampler, bounds, &fb);

    double frameTime = 0.0;
    auto t0 = std::chrono::steady_clock::now();
    integrator->Render(scene, frameTime);
    auto t1 = std::chrono::steady_clock::now();
    double wall = std::chrono::duration<double>(t1 - t0).count();

    fb.dumpLinearRGB(out);
    double paths = (double)W * H * spp;
    fprintf(stderr,
           "{\"w\": %d, \"h\": %d, \"spp\": %d, \"integrator\": \"%s\", "
           "\"max_depth\": %d, \"sigma\": %.1f, \"strategy\": \"%s\", "
           "\"skybox\": %d, \"wall_s\": %.3f, \"frame_time_s\": %.3f, "
           "\"Mpaths_per_s\": %.4f}\n",
           W, H, spp, integ.c_str(), maxDepth, sigma, strategy.c_str(), skybox,
           wall, frameTime, paths / wall / 1e6);
    return 0;
}
