"""HTJ2K CxtVLC code tables (ISO/IEC 15444-15:2019 Annex C Tables C.20/C.21).

Spec constants (as extracted by OpenJPH table0.h/table1.h; role of reference
jpeg2000/htj2k/vlc_tables.go + vlc_generator.go): each entry is
(context, rho, u_off, e_k, e_1, codeword, codeword_length), stored packed
4 bytes/entry: [cq<<5|rho<<1|uoff, ek<<4|e1, cwd, len].

From them we derive:
  - encoder LUT [2][2048]: (cq<<8|rho<<4|eps) -> cwd<<8 | len<<4 | ek
    (reference initOJPHEncoderVLCTable, openjph_cleanup_encoder.go:447-483)
  - decoder LUT [2][1024]: (cq<<7 | 7-bit window) ->
    ek<<12 | e1<<8 | rho<<4 | uoff<<3 | len
    (reference vlc_generator.go:60-120 / decoder usage
    openjph_cleanup_decoder.go:184-260)
"""

import base64

_T0 = "AgAGBAMRPwcEAAADBSJ/BwYAEQUHIl8HBzEfBwgAAgMJRBMGCgAOBQtEIwYLUQ8HDAADBg0AbwcOAC8HDyJPBw8gDQYQAAQDEYg9BhIAHQYTAC0GFAABBRWINQYVoncHFgA3BxcRVwcXEAkGGAAeBRnMFwcZxBUGGcglBhoAZwcbEScHG1RHBxvYBwccAHsHHSJLBx2oBQYd5DsHHgBbBx+ZGwcfumsHH/wrBx/4OQYf5nMHH+IZBh/1Cwcf9CkGH/EzByAAAAIiAA4EIxEfByQABgQlIjsGJgAbBicAPQYoAAoEKUQrBioACwYrRDMGK1F/BywAEwYtACMGLgA/By8iXwcvIAMGMAACBDGIHQYyAC0GMwANBjQANQY1iBUGNaJvBzYALwc3EU8HNxARBjgAAQU5iCUGOcQFBjoADwc7ERcHO1Q5BjvYdwc8ADcHPSJXBz2oGQY95GcHPgAHBz+4KQY/iCcHP6IJBj/kMQY/8UcHQAAAAkIADgRDERsGRAAGBEUiPwdGACsGRxEzBkcyfwdIAAoESUQLBkoAAQVLVS8HS1ETBktUIwZMAAMGTQBfB04AHwdPIm8HTzERBk90NwdQAAIEUYhPB1IAPQZTAB0GVAAtBlUADQZWAA8HVyJ3B1cgNQZYABUGWUQlBlnIVwdaABcHW4gFBlvEOQZb0WcHXAAnB10iewddIBkGXgBHB1/xKQZfEQkGXzIHB190MQZf+DsHYAAAA2IABARjET0GZAAMBWUiTwdmAB0GZxEFBmcyfwdoABYFaUQtBmoABgVrVRoFa1ENBmtUNQZsAD8HbURfB21iHwduAG8Hb2YvB29kFQZvc3cHb3ElBm9yDwdwAAoFcYgHB3IAOQZzETcHc5hXB3QAGQZ1iCkGdaIXB3YAZwd3sScHdxFHB3cyCQZ3uHsHeAAxBnlEEQZ5yDsHegBbB3uZGwd71SsHe9EhBnvcawd71AEGe9hLB3wACwd95HMHfUQTB33IPgZ94jMHfgBTB3+qDgZ/uWMHf/wDB3/4EgV/5iMHf/UeBn/0AgV/80MHf/EcBX/yLgaAAAACggAOBIMRPweEAAYEhSIbBoYAKwaHIj0GhzF/B4gACgSJRF8HigALBosAMwaMABMGjQAjBo4AHwePRG8Hj0ADBpAAAgSRiB0GkgARBpMAdweUAAEFlaovB5WiLQaVqA0GlgBPB5eyDweXADUGmAAVBpmIJQaZxDcHmgBXB5sRBwebEAUGnAAXB51EOQadyBkGneJnB54AJwefmUcHn5EpBp92ewefcgkGn7gxBp/0OwegAAADogAaBaMRfwekAAoFpSIdBqYALQanM18HpzI5BqcxPweoABIFqUQfB6oADQarRDUGq1FvB6wAFQatIiUGrWQvB64ATwevZlcHr2QFBq9zDwevcncHr3E3B7AAAgWxiBkGsgAmBrOIFwezkWcHtAAcBbWqKQa1ogkGtagxBrYAJwe3mQcHt5gRBrezRwe3siEGt7F7B7gAAQa5iD4GucQ7B7oAWwe7mWsHu5geBrvVGwe71C4Gu9ErB7wASwe9ZgsHveozB73iDga97HMHveg2Br3kUwe+ABMHv3dDB792Fga/dWMHv/wjB7/0DAW/2QMHv/o9B7/4FAW/830Hv/IEBb/xBgbAAAADwgAEBMMRAwbEAAwFxSINBsYAGgXHMz0GxzEdBscyLQbIAAoFyUQ/B8oANQbLERUGy1R/B8wAJQbNIl8HzWQfB84AbwfPZk8Hz2QFBs9zLwfPcTYGz3J3B9AAEgXRiA8H0gA5BtMRNwfTmFcH1AAZBtUiKQbVqBcH1gBnB9eZRwfXkQkG17onB9eyMQbXuHsH2AARBtnMBwfZyCEG2cQ7B9oAWwfbVTMH21QBBtvIGwfb0WsH3AArB93iSwfdIgsH3exzB93oPgbd5FMH3gATB99mHgbf6i4G3/MOBt/yAgXfuWMH3/wWBt/4Bgbf9SMH3/EcBd/0JgbgABIF4gAFBuMRfwfkADkG5SI/B+YAXwfnMx8H5zJvB+cxLwfoAE8H6UQPB+oAVwfrERkG61R3B+wANwftACkG7gAXB+9mZwfvcycH73JHB+91GwfvcQkG73QHB/AAewfxiDsH8gBbB/MAMQb0AFMH9SIRBvWoawf2ACsH95lLB/ezCwf3sXMH97ozB/eyIQb3uBMH+ABjB/mIIwf5xEMH+gADB/uZfQf71V0H+9EBBvvcPQf71D4G+9gdB/wAbQf9Zi0H/eoNB/3iHgb97E0H/egOBv3kdQf+ABUH//8GBf/9NQf/91UH//UaBf/7JQf/8woF//kuBv/xAAT//mUH//Y2Bv/6AgX/8gwE//wWBv/4BAT/9AgE"
_T1 = "AgAAAwMRJwYEAAYDBSIXBgYADQUHADsGCAACAwlEBwYKABUFCwArBgwAAQUNAH8HDgAfBw8AGwYQAAQDEYgFBRIAGQUTABMGFAAJBRWICwYVoj8HFgBfBxcAMwYYABEFGYgjBhnEbwcaAA8HGwADBhwALwcdRE8HHUA9Bh4AdwcfETcHHxAdBiAAAAEiAAUEIxF/ByQACQQlIh8HJgAdBScRPwcnMl8HKAANBSlENwcqAAMGKwBvBywALwctAE8HLgAPBy8AdwcwAAEEMYgXBzIACwYzAFcHNAAzBjUAZwc2ACcHNwArBzgAEwY5AEcHOgAHBzsAewc8ADsHPQBbBz4AGwc/RGsHP0AjBkAAAAFCAAkEQxF/B0QAAQRFIiMGRgA9BkciPwdHMR8HSAAVBUlEXwdKAAMGSwBvB0wALwdNAE8HTgAPB08AFwdQAAUFUYh3B1IANwdTAFcHVAAdBlWqewdVoi0GVahnB1YAJwdXskcHVwAHB1gADQZZADsHWgBbB1sAGwdcAGsHXUQrB11ASwdeAAsHX0RzB19RMwdfclMHX/gTB2AAAAJiAAoEYxELBmQAAgRlIiMGZgAOBWczfwdnMjMGZzETBmgAFgVpRD8HagADBmsRPQZrVB8HbAAdBm0AXwduAC0Gb0QvB29RHgZvcm8HcAAGBXGITwdyAA0GcwA1BnQAFQZ1IiUGdagPB3YABQZ3iDkGd7MXB3eyGQZ3sXcHeAApBnkACQZ6ADcHe0RXB3tAMQZ8AGcHfUQnB33IRwd94msHfgARBn9mBwd/c3sHf/o7B3/yIQZ/+AEGf6hbB3/1Gwd/8T4Gf/QrB4AAAAGCAA0FgxF/B4QAFQWFIj8HhgBfB4cAbweIAAkEiUQjBooAMwaLAB8HjAATBo0ALweOAE8HjwBXB5AAAQSRiA8HkgB3B5MANweUAB0GlQAXB5YAZweXAGsHmAAFBZnMJweZyEcHmcQHB5oAewebADsHnABbB50iGwedIAMGngArB58RSwefMgsHnzA9BqAAAAKiAB4FoxE7BqQACgWlIj8HpgAbBqcACwaoAAIEqUQrBqoADgWrRDMGq1F/B6wAEwatAG8HrgAjBq8iXwevIBUGsAAWBbGIAwayAD0GswAfB7QAHQa1AC0GtgANBrcRTwe3EDUGuAAGBblEJQa5yC8HugAFBrsRdwe7VDkGu9gPB7wAGQa9IlcHvagBBr3kNwe+ABoFv5kXB7/VZwe/8wcHv/EpBr92Jwe//AkGv/QxBr/6Rwe/+BEGv/IhBsAAAAPCAAIEwxEDBsQADATFIj0GxgAdBsciDQbHMX8HyAAEBMlELQbKAAoFy0Q1BstRLwfMABUGzSI/B81kXwfOACUGzyIpBs8xHwfPdG8H0AAWBdGIBQbSADkG0wAZBtQABgXVqg8H1aIJBtWoTwfWAA4G17J3B9ciNwfXqFcH17FHB9gAGgXZzBcH2chnB9nEJwfaADEG29QHB9tEewfbyDsH29ErB9wAEQbd5FsH3UQbB93qawfd6CEG3eIzB94AAQbfM0sH33YLB9/6cwff8j4G37lTB9/8Ywff+B4G3/UTB9/0Lgbf8SMH4AAEBOIAMwbjERMG5AAjBuUifwfmAAMG5xE/B+cybwfoAC0G6URfB+oAFgXrET0G61QfB+wAHQbtAHcH7gAGBe90LwfvRE8H73MPB+9xDQbvclcH8AA1BvGINwfyABUG8wAnB/QAJQb1ACkG9gAaBfexFwf3EWcH9zIFBve4ewf4ADkG+QAZBvoADAX70UcH+xEHB/tUCQb72BsH/AAxBv3iOwf9IlsH/ag+Bv3kCwf+AAAD//9rB//3Kwf/+0sH//MRBv92IQb/+gEG//IKBf+5Hgb//A4G//gSBf/1Lgb/8QIF//QcBQ=="


def _unpack(blob):
    raw = base64.b64decode(blob)
    out = []
    for i in range(0, len(raw), 4):
        b0, b1, cwd, ln = raw[i : i + 4]
        out.append((b0 >> 5, (b0 >> 1) & 0xF, b0 & 1, b1 >> 4, b1 & 0xF,
                    cwd, ln))
    return out


VLC_TBL0 = _unpack(_T0)
VLC_TBL1 = _unpack(_T1)


def _popcount(x):
    return bin(x).count("1")


def build_encoder_lut(table):
    """(cq<<8 | rho<<4 | eps) -> cwd<<8 | len<<4 | ek; 0 = invalid."""
    lut = [0] * 2048
    for i in range(2048):
        cq, rho, eps = i >> 8, (i >> 4) & 0xF, i & 0xF
        if (eps & rho) != eps or (rho == 0 and cq == 0):
            continue
        best = None
        if eps:
            best_ones = -1
            for (tcq, trho, tuoff, tek, te1, tcwd, tlen) in table:
                if (tcq == cq and trho == rho and tuoff == 1
                        and (eps & tek) == te1):
                    ones = _popcount(tek)
                    if ones >= best_ones:
                        best = (tcwd, tlen, tek)
                        best_ones = ones
        else:
            for (tcq, trho, tuoff, tek, te1, tcwd, tlen) in table:
                if tcq == cq and trho == rho and tuoff == 0:
                    best = (tcwd, tlen, tek)
                    break
        if best is not None:
            cwd, ln, ek = best
            lut[i] = (cwd << 8) | (ln << 4) | ek
    return lut


def build_decoder_lut(table):
    """(cq<<7 | window) -> ek<<12 | e1<<8 | rho<<4 | uoff<<3 | len."""
    lut = [0] * 1024
    for i in range(1024):
        cwd, cq = i & 0x7F, i >> 7
        for (tcq, trho, tuoff, tek, te1, tcwd, tlen) in table:
            if tcq != cq:
                continue
            mask = (1 << tlen) - 1
            if tcwd == (cwd & mask):
                lut[i] = ((tek << 12) | (te1 << 8) | (trho << 4)
                          | (tuoff << 3) | tlen)
                break
    return lut


ENC_LUT0 = build_encoder_lut(VLC_TBL0)
ENC_LUT1 = build_encoder_lut(VLC_TBL1)
DEC_LUT0 = build_decoder_lut(VLC_TBL0)
DEC_LUT1 = build_decoder_lut(VLC_TBL1)

# MEL exponent table (15444-15 Table 4; reference mel_spec.go)
MEL_E = (0, 0, 0, 1, 1, 1, 2, 2, 2, 3, 3, 4, 5)
