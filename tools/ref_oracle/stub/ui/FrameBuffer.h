// Headless stand-in for the reference's Qt FrameBuffer (ui/FrameBuffer.h).
// Same interface the render core calls (core/Integrator.cpp:230,307-310),
// but stores LINEAR radiance (no in-loop tonemap) so the dump is directly
// comparable to our linear HDR film.  This file is part of the parity
// harness, not the framework.
#ifndef __FrameBuffer_H__
#define __FrameBuffer_H__

#include <cstring>
#include <cstdio>
#include <string>
#include <vector>

class FrameBuffer {
public:
    FrameBuffer() : width(0), height(0), channals(0), curRenderCount(0) {}

    void renderCountIncrease() { curRenderCount++; }
    void renderCountClear() { curRenderCount = 0; }

    void InitBuffer(const int w = 800, const int h = 600, const int c = 4) {
        width = w; height = h; channals = c;
        ubuffer.assign((size_t)w * h * c, 0);
        fbuffer.assign((size_t)w * h * c, 0.f);
    }
    bool bufferResize(const int w = 800, const int h = 600) {
        // NOTE: the real FrameBuffer has a height=width bug here
        // (ui/FrameBuffer.h:80); we only ever pass square images so the
        // behavior is identical.
        InitBuffer(w, h, channals ? channals : 4);
        return true;
    }

    inline bool set_uc(const int w, const int h, const int shifting,
                       const unsigned char &dat) {
        if (w >= width || h >= height || w < 0 || h < 0) return false;
        ubuffer[(size_t)(w + h * width) * channals + shifting] = dat;
        return true;
    }

    inline bool update_f_u_c(const int w, const int h, const int shifting,
                             const float &dat) {
        if (w >= width || h >= height || w < 0 || h < 0) return false;
        size_t offset = (size_t)(w + h * width) * channals + shifting;
        float weight = 1.0f / (float)curRenderCount;   // running frame average
        fbuffer[offset] = weight * dat + (1.0f - weight) * fbuffer[offset];
        return true;                                   // tonemap deliberately omitted
    }

    unsigned char *getUCbuffer() { return ubuffer.data(); }

    // Dump the linear float buffer as raw float32 RGB (channel 3 dropped).
    bool dumpLinearRGB(const std::string &path) const {
        FILE *f = fopen(path.c_str(), "wb");
        if (!f) return false;
        for (int y = 0; y < height; ++y)
            for (int x = 0; x < width; ++x) {
                size_t o = (size_t)(x + y * width) * channals;
                fwrite(&fbuffer[o], sizeof(float), 3, f);
            }
        fclose(f);
        return true;
    }

private:
    std::vector<unsigned char> ubuffer;
    std::vector<float> fbuffer;
    int width, height, channals;
    int curRenderCount;
};

#endif
