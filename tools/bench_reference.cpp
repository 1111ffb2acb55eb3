// Reference-throughput benchmark (TEST TOOLING, not part of the framework).
//
// Compiles the *reference* repository's LoRaDemod block — the 5-state
// sample-consuming FSM (/root/reference/LoRaDemod.cpp) — against the
// minimal Pothos stub and times its work() loop over a repeated capture,
// single-threaded, built -O3 (a CMake Release build of the reference).
// The reference publishes no throughput numbers (BASELINE.md), so this
// measures its actual per-sample demod cost on this machine, giving the
// framework's `vs_baseline` a directly comparable on-box figure alongside
// the real-time requirement (0.5 Msamp/s at max BW).
//
// Prints one JSON line: {"samples", "seconds", "msps", "packets"}.
// No reference code lives in this repository; this file only *drives*
// the reference block.
//
// Usage: bench_reference <file.cf32> <sf> <sync> <thresh_dB> <mtu> <reps>

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <vector>

#include "LoRaDemod.cpp"  // the reference block (-I /root/reference)

int main(int argc, char **argv)
{
    if (argc != 7)
    {
        fprintf(stderr,
                "usage: %s <file.cf32> <sf> <sync> <thresh_dB> <mtu> <reps>\n",
                argv[0]);
        return 2;
    }
    const size_t sf = strtoul(argv[2], nullptr, 0);
    const unsigned sync = unsigned(strtoul(argv[3], nullptr, 0));
    const double thresh = atof(argv[4]);
    const size_t mtu = strtoul(argv[5], nullptr, 0);
    const size_t reps = strtoul(argv[6], nullptr, 0);
    const size_t N = size_t(1) << sf;

    FILE *f = fopen(argv[1], "rb");
    if (f == nullptr)
    {
        fprintf(stderr, "cannot open %s\n", argv[1]);
        return 2;
    }
    std::vector<uint8_t> bytes;
    uint8_t chunk[65536];
    size_t got = 0;
    while ((got = fread(chunk, 1, sizeof(chunk), f)) > 0)
        bytes.insert(bytes.end(), chunk, chunk + got);
    fclose(f);

    LoRaDemod *blk = static_cast<LoRaDemod *>(LoRaDemod::make(sf));
    blk->setSync((unsigned char)sync);
    blk->setThreshold(thresh);
    blk->setMTU(mtu);
    blk->activate();
    auto *in = blk->input(0);
    auto *out = blk->output(size_t(0));
    for (size_t r = 0; r < reps; r++)
        in->feedBytes(bytes.data(), bytes.size(), 8);

    const auto t0 = std::chrono::steady_clock::now();
    while (in->elements() >= 2 * N)
    {
        const size_t before = in->totalElements();
        blk->work();
        if (in->totalElements() == before) break;  // no progress
    }
    const auto t1 = std::chrono::steady_clock::now();
    const double sec = std::chrono::duration<double>(t1 - t0).count();
    const double samples = double(in->totalElements());

    printf("{\"samples\": %.0f, \"seconds\": %.4f, \"msps\": %.3f, "
           "\"packets\": %zu}\n",
           samples, sec, samples / sec / 1e6, out->packets.size());
    return 0;
}
