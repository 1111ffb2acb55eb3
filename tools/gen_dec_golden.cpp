// Decoder oracle driver (TEST TOOLING, not part of the framework).
//
// Compiles the *reference* repository's LoRaDecoder block
// (/root/reference/LoRaDecoder.cpp: gray re-encode + depad, diagonal
// deinterleave, LFSR dewhitening, FEC decode with the header quirks, CRC
// check, drop accounting) against the minimal Pothos stub, pushes one
// symbol packet through it, and prints JSON:
//
//   {"packets": [[byte, ...], ...], "dropped": N}
//
// Used by tests/test_demod_oracle.py to cross-check our decoder's output
// bytes and drop behavior against the actual reference block.  No
// reference code lives in this repository.
//
// Usage: gen_dec_golden <symbols.u16> <sf> <ppm> <cr> <whiten01>
//                       <crc01> <hdr01> <errchk01> <explicit01> <datalen>

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "LoRaDecoder.cpp"  // the reference block (-I /root/reference)

int main(int argc, char **argv)
{
    if (argc != 11)
    {
        fprintf(stderr,
                "usage: %s <symbols.u16> <sf> <ppm> <cr> <whiten01> "
                "<crc01> <hdr01> <errchk01> <explicit01> <datalen>\n",
                argv[0]);
        return 2;
    }
    FILE *f = fopen(argv[1], "rb");
    if (f == nullptr) return 2;
    std::vector<uint16_t> syms;
    uint16_t s16 = 0;
    while (fread(&s16, sizeof(s16), 1, f) == 1) syms.push_back(s16);
    fclose(f);

    LoRaDecoder *blk = static_cast<LoRaDecoder *>(LoRaDecoder::make());
    blk->setSpreadFactor(strtoul(argv[2], nullptr, 0));
    blk->setSymbolSize(strtoul(argv[3], nullptr, 0));
    blk->setCodingRate(argv[4]);
    blk->enableWhitening(atoi(argv[5]) != 0);
    blk->enableCrcc(atoi(argv[6]) != 0);
    blk->enableHdr(atoi(argv[7]) != 0);
    blk->enableErrorCheck(atoi(argv[8]) != 0);
    blk->enableExplicit(atoi(argv[9]) != 0);
    blk->setDataLength(strtoul(argv[10], nullptr, 0));
    blk->enableInterleaving(true);
    blk->activate();

    Pothos::Packet pkt;
    pkt.payload = Pothos::BufferChunk(typeid(uint16_t), syms.size());
    memcpy(pkt.payload.as<uint16_t *>(), syms.data(),
           syms.size() * sizeof(uint16_t));
    blk->input(0)->pushMessage(Pothos::Object(pkt));
    blk->work();

    auto *out = blk->output(size_t(0));
    printf("{\n  \"packets\": [");
    for (size_t p = 0; p < out->packets.size(); p++)
    {
        const auto &o = out->packets[p];
        const uint8_t *b = o.payload.as<const uint8_t *>();
        printf("%s[", p ? "," : "");
        for (size_t i = 0; i < o.payload.length; i++)
            printf("%s%u", i ? "," : "", unsigned(b[i]));
        printf("]");
    }
    printf("],\n  \"dropped\": %llu\n}\n", blk->getDropped());
    delete blk;
    return 0;
}
